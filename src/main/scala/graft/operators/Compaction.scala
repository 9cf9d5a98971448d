package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Small-files compaction — the OPTIMIZE-style layout maintenance every
  * streaming lake needs: micro-batch sinks (our IdempotentParquetSink
  * included) accrete one small file per epoch per partition, and at
  * 100 TB the resulting listing + footer + task-launch overhead
  * dominates scan cost long before the data does.
  *
  * `compact` is driver-light and fully distributed:
  *   1. list the input ONCE on the driver (names + sizes only — never
  *      row data) to size the job: n = ⌈bytes / targetFileBytes⌉;
  *   2. one range-partitioning exchange on the sort key spreads rows
  *      into exactly n output tasks (range, not hash, so each output
  *      file covers a NARROW key interval);
  *   3. `sortWithinPartitions` orders rows inside each file, making
  *      parquet footer min/max stats tight — post-compaction scans
  *      with a sort-key predicate skip whole files, which is the real
  *      payoff beyond fewer files.
  *
  * The rewrite is lossless by construction (one shuffle, no
  * row-altering expression); q149 pins that with a DuckDB oracle over
  * the ORIGINAL table, and CompactionSpec checks the file-count
  * arithmetic and within-file sortedness.
  */
object Compaction {

  /** Parquet-directory layout stats from one driver-side listing. */
  final case class LayoutStats(files: Long, bytes: Long, avgFileBytes: Long)

  def stats(spark: SparkSession, dir: String): LayoutStats = {
    val p = new Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(p)
      .filter(f => f.isFile && f.getPath.getName.startsWith("part-"))
    val bytes = files.map(_.getLen).sum
    LayoutStats(files.length, bytes,
      if (files.nonEmpty) bytes / files.length else 0L)
  }

  /** Rewrite `inDir` into `⌈bytes/targetFileBytes⌉` sort-clustered
    * files at `outDir`; returns the new layout's stats.
    */
  def compact(
      spark: SparkSession,
      inDir: String,
      outDir: String,
      targetFileBytes: Long,
      sortCols: Seq[String]): LayoutStats = {
    require(targetFileBytes > 0 && sortCols.nonEmpty)
    val in = stats(spark, inDir)
    val n = math.max(1L, (in.bytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(inDir)
      .repartitionByRange(n, sortCols.map(col): _*)
      .sortWithinPartitions(sortCols.map(col): _*)
      .write.mode("overwrite").parquet(outDir)
    stats(spark, outDir)
  }
}
