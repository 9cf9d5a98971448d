package graft

import org.apache.spark.sql.functions._

/** The custom DataSource V2 (sources/SeqSource.scala) pinned on all
  * three axes a real columnar source must get right: generation
  * correctness (differential vs a spark.range reconstruction), filter
  * pushdown (scan bounds provably narrowed BEFORE partition planning),
  * and column pruning (reader materializes only the projected schema).
  */
class Dsv2SourceSpec extends SparkSpec {

  private def seq(end: Long, slices: Int = 32) =
    spark.read.format("graft.sources.SeqSource")
      .option("start", 0L).option("end", end).option("slices", slices)
      .load()

  private def expected(end: Long) =
    spark.range(0, end).select(
      col("id"),
      (col("id") % 97).as("bucket"),
      (col("id") * 2654435761L % 1000003L).as("cents"),
      concat(lit("w"), col("id") % 13).as("word"))

  test("full read reproduces the arithmetic spec exactly") {
    val got = seq(10000).collect().map(_.toString).sorted
    val want = expected(10000).collect().map(_.toString).sorted
    assert(got.length == 10000 && got.sameElements(want))
  }

  test("id-range predicates narrow the planned scan bounds (pushdown before partitioning)") {
    val df = seq(1000000).filter(col("id") >= 400000L && col("id") < 400100L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[400000,400100)"),
      s"bounds not narrowed by pushdown:\n$plan")
    assert(plan.contains("pushed=") && plan.contains("GreaterThanOrEqual(id,400000)"),
      s"pushed filters not surfaced:\n$plan")
    assert(df.count() == 100)
    // An unsatisfiable range plans ZERO partitions and still answers.
    assert(seq(1000000).filter(col("id") < 0L).count() == 0)
  }

  test("non-id predicates are NOT pushed and still evaluate correctly") {
    val df = seq(10000).filter(col("bucket") === 3L)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("bounds=[0,10000)"), s"bounds must stay full:\n$plan")
    assert(df.count() == expected(10000).filter(col("bucket") === 3L).count())
  }

  test("column pruning reaches the reader") {
    val df = seq(5000).select(sum(col("cents")).as("s"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("cols=cents"), s"reader not pruned to cents:\n$plan")
    val want = expected(5000).agg(sum("cents")).head.getLong(0)
    assert(df.head.getLong(0) == want)
  }

  test("result is slice-count invariant (partitioning is pure planning)") {
    val a = seq(30000, slices = 1).agg(sum("cents"), count(lit(1))).head
    val b = seq(30000, slices = 17).agg(sum("cents"), count(lit(1))).head
    val c = seq(30000, slices = 64).agg(sum("cents"), count(lit(1))).head
    assert(a == b && b == c)
    assert(seq(30000, slices = 17).rdd.getNumPartitions == 17)
  }
}
