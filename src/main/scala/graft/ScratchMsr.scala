package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

// temporary spike (deleted before commit)
object ScratchMsr {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import org.apache.spark.sql.streaming.Trigger
    val ev = spark.range(0, 200).toDF("id")
      .select((col("id") % 7).as("key"),
        expr("timestamp_micros(cast(1704067200000000 + id * 3600000000 as long))").as("ts"),
        (col("id") % 100 + 1).as("cents"))
    val stage = java.nio.file.Files.createTempDirectory("msr_stage_").toString
    ev.filter(col("key") < 4).coalesce(1).write.mode("overwrite").parquet(s"$stage/t.parquet")
    Thread.sleep(1100)
    ev.filter(col("key") >= 4).coalesce(1).write.mode("append").parquet(s"$stage/t.parquet")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    val ckpt = java.nio.file.Files.createTempDirectory("msr_ck_").toString
    val outDir = java.nio.file.Files.createTempDirectory("msr_out_").toString
    val stream = spark.readStream.schema(ev.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$stage/t.parquet")
      .as[graft.streaming.MapStateRevenue.REvent](org.apache.spark.sql.Encoders
        .product[graft.streaming.MapStateRevenue.REvent])
      .withWatermark("ts", "0 seconds")
    val q = graft.streaming.MapStateRevenue.dailyRevenue(stream).toDF()
      .writeStream.format("parquet").option("path", outDir)
      .option("checkpointLocation", ckpt)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    println("offsets: " + new java.io.File(s"$ckpt/offsets").list().toSeq.sorted.mkString(","))
    val snaps = spark.read.parquet(outDir)
    snaps.groupBy("tagMs").agg(count(lit(1)), countDistinct("key")).orderBy("tagMs").show(false)
    println("keys: " + snaps.select("key").distinct().count())
    spark.stop()
  }
}
