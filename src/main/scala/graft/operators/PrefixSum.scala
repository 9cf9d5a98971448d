package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed running total (inclusive prefix sum) over a global
  * order — WITHOUT the single-partition global window that
  * `sum(...).over(Window.orderBy(...))` plans (WindowExec moves ALL
  * rows to one task; the warning the bench log shows).
  *
  * Two-pass scan, the same shape as RDD.zipWithIndex:
  *   1. range-repartition on the order key, sort within partitions;
  *      per-partition totals (one row per partition) come to the
  *      driver — O(#partitions) scalars, never row data — and are
  *      folded into exclusive per-partition offsets, broadcast back;
  *   2. within each partition a PARTITIONED window (partitionBy the
  *      partition id) computes the local running sum; global cum =
  *      partition offset + local cum. Every stage is partition-
  *      parallel.
  *
  * The result is independent of partition boundaries: cum depends only
  * on the total order of `orderCol` (which must be unique — document
  * ids are). Range partitioning keeps equal/adjacent keys together and
  * makes the per-partition sort O(n/p log n/p).
  */
object PrefixSum {

  /** Adds `cumCol` = inclusive running sum of `valueCol` over
    * ascending `orderCol` (must be globally unique).
    *
    * Physical selection is cost-based, mirroring Spark's own
    * broadcast-join threshold: below `smallInputBytes` (Catalyst's
    * size estimate) the single-partition window is strictly better —
    * one task, no boundary-sampling scan, no materialization — so it
    * is used; above it, the two-pass distributed scan. Pass
    * `smallInputBytes = 0` to force the distributed path.
    */
  def runningTotal(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      cumCol: String,
      numPartitions: Int = 0,
      smallInputBytes: Long = 64L << 20): DataFrame = {
    val spark = df.sparkSession
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(smallInputBytes)) {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col(orderCol).asc)
        .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow)
      return df.withColumn(cumCol, sum(col(valueCol).cast("long")).over(w))
    }
    val p = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())

    // Pass 1: per-partition totals → exclusive offsets. O(p) rows to
    // the driver (the zipWithIndex pattern) — scan-free for pass 2
    // because parted is cached by the localCheckpoint below.
    val checkpointed = parted.localCheckpoint(true)
    val totals = checkpointed.groupBy("__pid")
      .agg(sum(col(valueCol).cast("long")).as("__t"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    val offsets = totals.scanLeft((0, 0L)) { case ((_, acc), (pid, t)) => (pid, acc + t) }
      .tail.zip(totals)
      .map { case ((_, cumIncl), (pid, t)) => (pid, cumIncl - t) }
    val offsetDf = spark.createDataFrame(offsets.toSeq)
      .toDF("__pid", "__offset")

    // Pass 2: partitioned (parallel) local running sum + offset.
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid")
      .orderBy(col(orderCol).asc)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    checkpointed
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(cumCol, sum(col(valueCol).cast("long")).over(w) + col("__offset"))
      .drop("__pid", "__offset")
  }

  /** Adds `cumCol` = EXCLUSIVE running maximum of long `valueCol` over
    * ascending `orderCol` (the max over all STRICTLY-preceding rows;
    * the first row gets `Long.MinValue` — a sentinel every real value
    * exceeds, so `valueCol > cumCol` is the "strict prefix-maximum"
    * predicate without a null branch). This is the scan under 2-D
    * skyline/Pareto queries: a point survives iff its second
    * dimension strictly exceeds everything that beats it on the
    * first.
    *
    * Same two-pass shape and cost contract as [[runningTotal]]:
    * range-repartition, O(#partitions) per-partition maxima to the
    * driver folded into exclusive prefix maxima, then a PARTITIONED
    * exclusive-frame window plus `greatest(local, offset)`. Below
    * `smallInputBytes` the single-partition window is used (same
    * cost-based rule; max is associative so both paths agree
    * exactly). `orderCol` must be globally unique (call it on a
    * per-key aggregated frame, as the skyline does).
    */
  def runningMaxExclusive(
      df: DataFrame,
      orderCol: String,
      valueCol: String,
      cumCol: String,
      numPartitions: Int = 0,
      smallInputBytes: Long = 64L << 20): DataFrame = {
    val spark = df.sparkSession
    val excl = (w: org.apache.spark.sql.expressions.WindowSpec) =>
      w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(smallInputBytes)) {
      val w = excl(org.apache.spark.sql.expressions.Window.orderBy(col(orderCol).asc))
      return df.withColumn(cumCol,
        coalesce(max(col(valueCol).cast("long")).over(w), lit(Long.MinValue)))
    }
    val p = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(p, col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val checkpointed = parted.localCheckpoint(true)
    val maxima = checkpointed.groupBy("__pid")
      .agg(max(col(valueCol).cast("long")).as("__m"))
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
      .sortBy(_._1)
    // exclusive prefix maxima: partition i's offset = max of all
    // earlier partitions' maxima (MinValue for the first)
    val prefix = maxima.scanLeft(Long.MinValue) {
      case (acc, (_, m)) => math.max(acc, m)
    }.init
    val offsets = maxima.map(_._1).zip(prefix)
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
    val w = excl(org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(col(orderCol).asc))
    checkpointed
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(cumCol, greatest(
        coalesce(max(col(valueCol).cast("long")).over(w), lit(Long.MinValue)),
        col("__offset")))
      .drop("__pid", "__offset")
  }

  /** Adds `rankCol` = 1-based global rank over the ascending composite
    * order `orderCols` — distributed zipWithIndex. Same two-pass shape
    * as [[runningTotal]]: range-repartition on the full tuple,
    * O(#partitions) row counts to the driver as exclusive offsets,
    * then a PARTITIONED row_number window plus offset. Below
    * `smallInputBytes` the single-partition window is strictly better
    * and is used (documented at call sites — PlanAudit flags it
    * otherwise).
    *
    * Tie contract: when the order tuple is UNIQUE, every rank is fully
    * deterministic (q93/q138/q139 rely on this). DUPLICATE tuples are
    * permitted — the result is still a bijection onto 1..n, and any
    * per-tie-class aggregate of the ranks (min, max, count, sum — what
    * Stats.spearmanByGroup consumes for tie-averaged ranks) is
    * deterministic, but WHICH duplicate gets which rank within the
    * class is partition-order dependent. Don't project individual
    * ranks of duplicated tuples into a judged result.
    */
  def globalRank(
      df: DataFrame,
      orderCols: Seq[String],
      rankCol: String,
      numPartitions: Int = 0,
      smallInputBytes: Long = 64L << 20): DataFrame = {
    val spark = df.sparkSession
    val order = orderCols.map(col(_).asc)
    if (df.queryExecution.optimizedPlan.stats.sizeInBytes <= BigInt(smallInputBytes)) {
      val w = org.apache.spark.sql.expressions.Window.orderBy(order: _*)
      return df.withColumn(rankCol, row_number().over(w).cast("long"))
    }
    val p = if (numPartitions > 0) numPartitions else spark.sparkContext.defaultParallelism
    val parted = df
      .repartitionByRange(p, orderCols.map(col): _*)
      .withColumn("__pid", spark_partition_id())
    val checkpointed = parted.localCheckpoint(true)
    val counts = checkpointed.groupBy("__pid").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.scanLeft((0, 0L)) { case ((_, acc), (pid, n)) => (pid, acc + n) }
      .tail.zip(counts)
      .map { case ((_, cumIncl), (pid, n)) => (pid, cumIncl - n) }
    val offsetDf = spark.createDataFrame(offsets.toSeq).toDF("__pid", "__offset")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("__pid").orderBy(order: _*)
    checkpointed
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(rankCol, row_number().over(w).cast("long") + col("__offset"))
      .drop("__pid", "__offset")
  }
}
