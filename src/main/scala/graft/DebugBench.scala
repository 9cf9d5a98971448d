package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness: runs one named query N times under
  * collect/noop to separate plan cost from sink cost.
  * Usage: sbt "runMain graft.DebugBench q07_text_wordcount 3 [cold]"
  *
  * Default (warm) reps do NOT clear the cache between reps, so a query
  * that persist()s intermediates reuses rep 1's cached blocks via the
  * CacheManager's plan matching — that measures steady-state cost, but
  * UNDERSTATES the bench, which runs every query exactly once after
  * clearCache. Pass `cold` as the 3rd arg to apply Bench-identical
  * hygiene (clearCache + unpersist + GC) before EVERY rep: cold-mode
  * noop times are the bench-comparable numbers for persisting queries.
  */
object DebugBench {
  /** The round-9 bench's cold-rep residents — `runMain graft.DebugBench
    * c10 3 cold` refreshes the ledger's medians in one command.
    * Update alongside BENCH_r{N}.json's c10 when the set shifts.
    */
  val C10: String = Seq(
    "q212_local_clustering", "q333_stream_join_window", "q153_triangle_count",
    "q201_hits", "q103_spearman", "q328_stream_outer_join",
    "q131_pagerank", "q348_stream_semi_join", "q130_lexical_diversity",
    "q324_sessions_tws_stream").mkString(",")

  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q07_text_wordcount") match {
      case "c10" => C10
      case n => n
    }
    val reps = if (args.length > 1) args(1).toInt else 3
    val cold = args.length > 2 && args(2) == "cold"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    def hygiene(): Unit = {
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // Comma-separated names share one JVM (amortizes the ~15s sbt/Spark
    // startup when refreshing the ledger's cold medians).
    for (n <- name.split(",")) {
      val fn = SparkEntry.queries(n)
      for (i <- 1 to reps) {
        if (cold) {
          hygiene()
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val tNoop = (System.nanoTime() - t0) / 1e9
          println(f"[debug] $n rep$i(cold) noop=$tNoop%.2fs")
        } else {
          var t0 = System.nanoTime()
          fn(spark, sfDir).collect()
          val tCollect = (System.nanoTime() - t0) / 1e9
          t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val tNoop = (System.nanoTime() - t0) / 1e9
          println(f"[debug] $n rep$i collect=$tCollect%.2fs noop=$tNoop%.2fs")
        }
      }
      if (!name.contains(",")) fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
