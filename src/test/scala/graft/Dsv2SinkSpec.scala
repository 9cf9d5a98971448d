package graft

import org.apache.spark.sql.functions._

/** The transactional DSv2 sink (sources/LedgerSink.scala) pinned on the
  * axes that make it a COMMIT PROTOCOL rather than a file dump:
  * round-trip fidelity (incl. escaping and nulls), job-failure
  * atomicity (a failing partition must leave no committed state and no
  * staging debris), append-accumulates / overwrite-replaces semantics,
  * and batch/streaming writes interleaving on one commit log.
  */
class Dsv2SinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft_ledger_").toString

  private def write(df: org.apache.spark.sql.DataFrame, dir: String): Unit =
    df.write.format("graft.sources.LedgerSink")
      .option("path", dir).mode("append").save()

  private def read(dir: String) =
    spark.read.format("graft.sources.LedgerSink").option("path", dir).load()

  test("round trip: longs, doubles (shortest-repr lossless), strings with tabs/newlines, nulls") {
    val dir = tmp()
    val df = Seq(
      (1L, Some(1.5), Some("plain")),
      (2L, Some(-0.1), Some("tab\there")),
      (3L, Some(1.0 / 3.0), Some("line\nbreak")),
      (4L, None: Option[Double], Some("back\\slash")),
      (5L, Some(Double.MinPositiveValue), None: Option[String]),
      (6L, Some(0.1 + 0.2), Some("\\N")) // literal sentinel lookalike survives
    ).toDF("k", "v", "s").repartition(3)
    write(df, dir)
    val got = read(dir).orderBy("k").collect()
    val want = df.orderBy("k").collect()
    assert(got.sameElements(want), s"got ${got.mkString(",")}")
  }

  test("atomic abort: a failing partition leaves no manifest, no data, no staging debris") {
    val dir = tmp()
    val bad = spark.range(0, 100, 1, 4).toDF("k")
      .withColumn("k", when(col("k") === 99L,
        raise_error(lit("boom")).cast("long")).otherwise(col("k")))
    intercept[Exception] { write(bad, dir) }
    val root = java.nio.file.Paths.get(dir)
    assert(!java.nio.file.Files.exists(root.resolve("manifest.ledger")),
      "failed job must not publish a manifest")
    val staged = java.nio.file.Files.list(root.resolve("_staging")).count()
    assert(staged == 0L, s"abort must sweep staging, found $staged files")
    // No committed state exists, so there is no table to read at all.
    val noTable = intercept[IllegalArgumentException] { read(dir) }
    assert(noTable.getMessage.contains("no ledger manifest"), noTable.getMessage)
  }

  test("append accumulates: the second append's rows join the first (AppendData contract)") {
    val dir = tmp()
    write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    write(Seq((10L, "x")).toDF("k", "s"), dir)
    val got = read(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (10L, "x")), s"append must accumulate, got $got")
  }

  test("overwrite truncates: the snapshot fully replaces prior appends, and old data files are GC'd") {
    val dir = tmp()
    write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    Seq((10L, "x")).toDF("k", "s").write.format("graft.sources.LedgerSink")
      .option("path", dir).mode("overwrite").save()
    val got = read(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((10L, "x")), s"overwrite must replace, got $got")
    // Exactly one commit manifest survives, and orphaned data files are gone.
    val commits = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir).resolve("commits")).count()
    assert(commits == 1L, s"expected 1 commit manifest after overwrite, found $commits")
    val m = graft.sources.LedgerSink.readManifest(java.nio.file.Paths.get(dir)).get
    val onDisk = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir).resolve("data")).count()
    assert(onDisk == m.files.size.toLong,
      s"overwrite must GC unreferenced data files: $onDisk on disk vs ${m.files.size} referenced")
    // A subsequent append extends the new snapshot, not the old one.
    write(Seq((11L, "y")).toDF("k", "s"), dir)
    val got2 = read(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got2 == Set((10L, "x"), (11L, "y")), got2.toString)
  }

  test("batch append and streaming epochs interleave on one commit log without clobbering") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    implicit val sqlCtx = spark.sqlContext
    write(spark.range(0, 3).toDF("k"), dir) // batch rows 0,1,2
    val mem = MemoryStream[Long]
    mem.addData(100L, 101L)
    val q = mem.toDF().toDF("k")
      .writeStream.format("graft.sources.LedgerSink")
      .option("path", dir).option("checkpointLocation", tmp())
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    write(spark.range(200, 202).toDF("k"), dir) // batch rows 200,201
    val got = read(dir).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(0L, 1L, 2L, 100L, 101L, 200L, 201L)), got.mkString(","))
  }

  test("manifest row counts equal the data (the audit a sink monitor reads)") {
    val dir = tmp()
    write(spark.range(0, 1000, 1, 7).toDF("k"), dir)
    val m = graft.sources.LedgerSink.readManifest(java.nio.file.Paths.get(dir)).get
    assert(m.files.map(_._2).sum == 1000L)
    assert(m.files.size == 7)
    assert(read(dir).count() == 1000L)
  }

  test("streaming write: epochs accumulate; restart from checkpoint keeps exactly-once") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    val dir = tmp()
    val ckpt = tmp()
    implicit val sqlCtx = spark.sqlContext

    val mem = MemoryStream[Long]
    def start() = mem.toDF().toDF("k")
      .writeStream.format("graft.sources.LedgerSink")
      .option("path", dir).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start()

    mem.addData(1L, 2L, 3L)
    val q1 = start(); q1.awaitTermination()
    mem.addData(4L, 5L)
    val q2 = start(); q2.awaitTermination()
    val got = read(dir).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L, 3L, 4L, 5L)), got.mkString(","))
    // Two committed epoch manifests, no staging debris.
    val epochs = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir).resolve("commits")).count()
    assert(epochs == 2L, s"expected 2 epoch manifests, found $epochs")
    val staged = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir).resolve("_staging")).count()
    assert(staged == 0L, s"staging must be swept, found $staged")
  }

  test("streaming replay of a committed epoch is a no-op (idempotent commit)") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = tmp()
    val schema = StructType(Seq(StructField("k", LongType)))
    val w = graft.sources.LedgerStreamingWrite(dir, schema, "qid")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir).resolve("_staging"))
    def stage(name: String, rows: Seq[Long]): graft.sources.LedgerCommitMessage = {
      val p = java.nio.file.Paths.get(dir).resolve("_staging").resolve(name)
      java.nio.file.Files.write(p,
        rows.mkString("", "\n", "\n").getBytes("UTF-8"))
      graft.sources.LedgerCommitMessage(name, rows.size.toLong)
    }
    w.commit(0L, Array(stage("qid-e0-p0-t1.tsv", Seq(1L, 2L))))
    val after1 = read(dir).collect().map(_.getLong(0)).sorted
    // Replay of epoch 0 with a RETRY attempt's staged file: dropped.
    w.commit(0L, Array(stage("qid-e0-p0-t9.tsv", Seq(1L, 2L))))
    val after2 = read(dir).collect().map(_.getLong(0)).sorted
    assert(after1.sameElements(Array(1L, 2L)) && after2.sameElements(after1))
    // The duplicate staged file was swept, not published.
    val staged = java.nio.file.Files.list(
      java.nio.file.Paths.get(dir).resolve("_staging")).count()
    assert(staged == 0L)
  }

  test("epoch replay repairs a crash between writeCommit and republish") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val dir = tmp()
    val schema = StructType(Seq(StructField("k", LongType)))
    val w = graft.sources.LedgerStreamingWrite(dir, schema, "qid")
    java.nio.file.Files.createDirectories(
      java.nio.file.Paths.get(dir).resolve("_staging"))
    def stage(name: String, rows: Seq[Long]): graft.sources.LedgerCommitMessage = {
      val p = java.nio.file.Paths.get(dir).resolve("_staging").resolve(name)
      java.nio.file.Files.write(p,
        rows.mkString("", "\n", "\n").getBytes("UTF-8"))
      graft.sources.LedgerCommitMessage(name, rows.size.toLong)
    }
    w.commit(0L, Array(stage("qid-e0-p0-t1.tsv", Seq(1L, 2L))))
    // Simulate the crash window: the epoch manifest is durable in the
    // commit log but the published view was lost before republish.
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(dir).resolve("manifest.ledger"))
    // Restart replays epoch 0 — the replay branch must REPUBLISH, not
    // just drop duplicates, or a terminating stream's rows stay
    // invisible forever.
    w.commit(0L, Array(stage("qid-e0-p0-t9.tsv", Seq(1L, 2L))))
    val got = read(dir).collect().map(_.getLong(0)).sorted
    assert(got.sameElements(Array(1L, 2L)),
      s"replay must repair the published manifest, got ${got.mkString(",")}")
  }

  test("interrupted overwrite: staged-but-unswapped log rolls BACK at the next commit") {
    val dir = tmp()
    write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    val root = java.nio.file.Paths.get(dir)
    // Simulate a truncate that crashed after fully staging commits.next
    // but before its first rename: the live log must win.
    val next = root.resolve("commits.next")
    java.nio.file.Files.createDirectories(next)
    java.nio.file.Files.write(next.resolve("batch-0.manifest"),
      "data/ghost.tsv\t1".getBytes("UTF-8"))
    write(Seq((3L, "c")).toDF("k", "s"), dir)
    assert(!java.nio.file.Files.exists(next),
      "recoverLog must discard the staged log of an overwrite that never swapped")
    val got = read(dir).collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")),
      s"old snapshot must survive an unswapped overwrite, got $got")
  }

  test("interrupted overwrite: mid-swap (old log retired, new staged) rolls FORWARD") {
    val dir = tmp()
    write(Seq((1L, "a"), (2L, "b")).toDF("k", "s"), dir)
    val root = java.nio.file.Paths.get(dir)
    val commits = root.resolve("commits")
    // Simulate a truncate that crashed between its two renames: the old
    // log is retired, the (complete) staged log has not been promoted.
    java.nio.file.Files.move(commits, root.resolve("commits.retired"))
    val next = root.resolve("commits.next")
    java.nio.file.Files.createDirectories(next)
    // The "new snapshot" references a real data file so the promoted
    // view is readable.
    val dataFile = scala.util.Using.resource(
      java.nio.file.Files.list(root.resolve("data")))(s =>
      s.iterator().next().getFileName.toString)
    java.nio.file.Files.write(next.resolve("batch-0.manifest"),
      s"data/$dataFile\t2".getBytes("UTF-8"))
    write(Seq((3L, "c")).toDF("k", "s"), dir)
    assert(!java.nio.file.Files.exists(next) &&
      !java.nio.file.Files.exists(root.resolve("commits.retired")),
      "recoverLog must promote the staged log and drop the retired one")
    val manifests = scala.util.Using.resource(
      java.nio.file.Files.list(commits)) { s =>
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.map(_.getFileName.toString).toSet
    }
    assert(manifests.exists(_.startsWith("batch-0")) && manifests.size == 2,
      s"promoted log must hold the new snapshot + the append, got $manifests")
  }

  test("unsupported column types are rejected before any file is touched") {
    val dir = tmp()
    val e = intercept[Exception] {
      write(Seq((1, java.sql.Date.valueOf("2024-01-01"))).toDF("k", "d"), dir)
    }
    assert(e.getMessage.contains("LedgerSink supports"), e.getMessage)
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(dir).resolve("manifest.ledger")))
  }
}
