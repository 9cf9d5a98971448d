package graft

import org.apache.spark.sql.SparkSession

/** Scratch timing harness: runs one named query N times under
  * collect/noop to separate plan cost from sink cost.
  * Usage: sbt "runMain graft.DebugBench q07_text_wordcount 3"
  */
object DebugBench {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q07_text_wordcount")
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").groupBy("r_name").count().collect()
    val fn = SparkEntry.queries(name)
    for (i <- 1 to reps) {
      var t0 = System.nanoTime()
      fn(spark, sfDir).collect()
      val tCollect = (System.nanoTime() - t0) / 1e9
      t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val tNoop = (System.nanoTime() - t0) / 1e9
      println(f"[debug] $name rep$i collect=$tCollect%.2fs noop=$tNoop%.2fs")
    }
    fn(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
