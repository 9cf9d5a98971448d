package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** operators/Compaction pinned on its three claims: the file-count
  * arithmetic (⌈bytes/target⌉), losslessness of the rewrite, and
  * within-file sort order (what makes footer min/max stats tight).
  */
class CompactionSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("graft-compact").toString

  test("compaction merges a shattered layout to ceil(bytes/target) sorted files, losslessly") {
    val in = tmp(); val out = tmp()
    val orders = spark.read.parquet(s"${sf()}/orders.parquet")
    orders.repartition(16).write.mode("overwrite").parquet(in)
    val before = Compaction.stats(spark, in)
    assert(before.files == 16)

    // Large target → everything folds into ONE file.
    val after = Compaction.compact(spark, in, out, 1L << 30,
      Seq("o_orderdate", "o_orderkey"))
    assert(after.files == 1, s"expected 1 file, got $after")

    // Lossless: same rows, nothing altered.
    val a = spark.read.parquet(out).collect().map(_.toString).sorted
    val b = orders.collect().map(_.toString).sorted
    assert(a.length == b.length && a.sameElements(b))
  }

  test("small target splits into multiple range-clustered files, each sorted within") {
    val in = tmp(); val out = tmp()
    spark.read.parquet(s"${sf()}/orders.parquet")
      .repartition(16).write.mode("overwrite").parquet(in)
    val before = Compaction.stats(spark, in)
    val target = before.bytes / 4 + 1 // → ⌈bytes/target⌉ = 4
    val after = Compaction.compact(spark, in, out, target,
      Seq("o_orderdate", "o_orderkey"))
    assert(after.files == 4, s"expected 4 files, got $after")

    // Within-file sortedness — read each part file alone and check the
    // (date, key) sequence is monotone; this is what gives tight
    // footer stats and post-compaction file skipping.
    val fs = new org.apache.hadoop.fs.Path(out)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val parts = fs.listStatus(new org.apache.hadoop.fs.Path(out))
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    assert(parts.length == 4)
    parts.foreach { f =>
      val rows = spark.read.parquet(f.getPath.toString)
        .select(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long"),
          col("o_orderkey"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(rows.sameElements(rows.sortBy(identity)),
        s"file ${f.getPath.getName} not sorted within")
    }

    // Range clustering: the per-file key intervals must not overlap.
    val spans = parts.map { f =>
      val d = spark.read.parquet(f.getPath.toString)
        .select(datediff(col("o_orderdate"), lit("1970-01-01")).cast("long").as("day"))
        .agg(min("day"), max("day")).head
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    spans.sliding(2).foreach { case Array((_, hiA), (loB, _)) =>
      assert(hiA <= loB, s"file key ranges overlap: ${spans.mkString(", ")}")
    }
  }
}
