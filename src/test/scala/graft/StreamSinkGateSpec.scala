package graft

import org.scalatest.funsuite.AnyFunSuite

/** Streaming-sink GRAIN gate — the writeStream twin of PlanSpec's
  * empty-partitioning-WindowExec gate. A `format("memory")` sink
  * collects every output row into a driver-side table; that is
  * correct ONLY when the output grain is bounded by construction
  * (a fixed dimension or the calendar), never when it scales with
  * the fact table (users, sessions, documents). Fact-grain streaming
  * output must ride the distributed file sink (`runToParquetSink`,
  * q328's rule). Every memory-sink site in the query surface must be
  * allowlisted here with a bounded-grain justification; anything new
  * fails this spec until it is either re-routed to the file sink or
  * justified.
  */
class StreamSinkGateSpec extends AnyFunSuite {

  // query name -> why a driver-side memory table is safe at 100 TB
  private val bounded = Map(
    "q327_stream_static_enrich" ->
      "nation grain: 25 rows, Complete mode — bounded by the dimension",
    "q343_stream_union_sources" ->
      "day x kind grain — calendar-bounded (~365 rows/yr x 2 kinds)",
    "q344_stream_dedup_window" ->
      ("day grain — the dedup state is user x day (watermark-evicted); " +
        "only the day-count lands on the driver"),
    "q333_stream_join_window" ->
      ("day x campaign grain — campaign is a marketing dimension " +
        "(tens-to-thousands of keys, documented in q333's Scaladoc), " +
        "not fact-grain; day is calendar-bounded"))

  test("memory sinks appear ONLY at documented bounded-grain sites") {
    val src = java.nio.file.Paths.get("src/main/scala/graft")
    import scala.jdk.CollectionConverters._
    val defRe = raw"\bdef\s+(\w+)\s*\(".r
    val offenders = java.nio.file.Files.walk(src).iterator().asScala
      .filter(_.toString.endsWith(".scala")).flatMap { p =>
        var current = "<top>"
        java.nio.file.Files.readAllLines(p).asScala.zipWithIndex.flatMap {
          case (line, i) =>
            defRe.findFirstMatchIn(line).foreach(m => current = m.group(1))
            if (line.contains("format(\"memory\")") && !bounded.contains(current))
              Some(s"$p:${i + 1} (in $current)")
            else None
        }
      }.toList
    assert(offenders.isEmpty,
      s"undocumented driver-side memory sink at: ${offenders.mkString(", ")} — " +
        "route fact-grain streaming output through runToParquetSink or add a " +
        "bounded-grain justification to the allowlist above")
  }

  test("every allowlisted site still exists (no stale entries)") {
    // The query defs live in the per-family trait files under
    // queries/ since the round-13 split of the Queries monolith.
    import scala.jdk.CollectionConverters._
    val qsrc = java.nio.file.Files
      .walk(java.nio.file.Paths.get("src/main/scala/graft/queries"))
      .iterator().asScala
      .filter(_.toString.endsWith(".scala"))
      .map(p => new String(java.nio.file.Files.readAllBytes(p)))
      .mkString("\n")
    val stale = bounded.keys.filterNot(q => qsrc.contains(s"def $q("))
    assert(stale.isEmpty, s"allowlist entries with no query: ${stale.mkString(", ")}")
  }
}
