package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join: for each left row, attach the single latest
  * right row of the same key with `right.ts <= left.ts` (inclusive), or
  * nulls when no such row exists — the standard time-series
  * "most recent quote for each trade" operator, which Spark lacks as a
  * built-in.
  *
  * Implementation is the union+window form, chosen for scale: tag both
  * sides, union, and run ONE window pass per key ordered by time, where
  * `last(rightPayload, ignoreNulls)` carries the most recent right row
  * forward onto each left row. Cost is a single hash shuffle on the key
  * plus an in-partition sort — linear in |left| + |right|. The naive
  * alternative (range join `l.ts >= r.ts` + keep-max) explodes to
  * O(|left| · |right|) pairs per key and cannot survive 100 TB; Spark
  * would plan it as BNLJ. Skewed keys behave like any windowed
  * aggregation (hot key → hot partition); salting does not apply
  * because the window needs the whole key ordered, so extremely hot
  * keys would need a range-bucketed two-pass variant.
  *
  * Determinism: right rows that tie on the timestamp are resolved to
  * the greatest `rightTieCol` (ORDER BY ts DESC, tie DESC LIMIT 1 in
  * SQL terms). At equal left/right timestamps the right row IS eligible
  * (inclusive bound) — right rows sort before left rows on ties.
  *
  * Left rows with a null timestamp match nothing (nulls sort first in
  * the window order, before any right row).
  */
object AsOfJoin {

  /** @param keyCol       equi-key present on both sides
    * @param leftTsCol    event-time column on `left`
    * @param rightTsCol   event-time column on `right`
    * @param rightTieCol  right-side column breaking equal-ts ties
    *                     (greatest wins); must be on `right`
    * @param rightPrefix  prefix for the attached right payload columns
    *                     (every `right` column except the key)
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String = "r_"): DataFrame =
    joinImpl(left, right, keyCol, leftTsCol, rightTsCol, rightTieCol,
      rightPrefix, forward = false)

  /** Forward as-of join: the single EARLIEST right row with
    * `right.ts >= left.ts` (inclusive); ties on the timestamp resolve
    * to the smallest `rightTieCol`. Same union+window machinery as
    * `backward`, with the time axis reversed.
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String = "r_"): DataFrame =
    joinImpl(left, right, keyCol, leftTsCol, rightTsCol, rightTieCol,
      rightPrefix, forward = true)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String,
      forward: Boolean): DataFrame = {
    val leftCols = left.columns.toSeq
    val rightPayload = right.columns.toSeq.filterNot(_ == keyCol)

    val lStruct = struct(leftCols.map(left(_)): _*)
    val rStruct = struct(rightPayload.map(right(_)): _*)
    val lType = org.apache.spark.sql.types.StructType(
      leftCols.map(c => left.schema(c)))
    val rType = org.apache.spark.sql.types.StructType(
      rightPayload.map(c => right.schema(c)))

    // side 0 = right, 1 = left: at equal timestamps the right row sorts
    // first, making it visible to the left row (inclusive as-of).
    // Backward walks time ascending (last right seen = latest <= t);
    // forward walks descending (last right seen = earliest >= t, with
    // the tie order reversed so the smallest tie id wins).
    val tieSentinel = if (forward) Long.MinValue else Long.MaxValue
    val tagged = right.filter(right(rightTsCol).isNotNull).select(
      right(keyCol).as("__k"),
      right(rightTsCol).as("__t"),
      lit(0).as("__side"),
      right(rightTieCol).cast("long").as("__tie"),
      lit(null).cast(lType).as("__l"),
      rStruct.as("__r"))
      .unionByName(left.select(
        left(keyCol).as("__k"),
        left(leftTsCol).as("__t"),
        lit(1).as("__side"),
        lit(tieSentinel).as("__tie"),
        lStruct.as("__l"),
        lit(null).cast(rType).as("__r")))

    // nulls_first in BOTH directions: a left row with a null timestamp
    // walks before any (non-null-ts) right row, so it matches nothing.
    // Null-ts right rows are filtered above — they can never qualify.
    val order =
      if (forward) Seq(col("__t").desc_nulls_first, col("__side").asc, col("__tie").desc)
      else Seq(col("__t").asc_nulls_first, col("__side").asc, col("__tie").asc)
    val w = Window.partitionBy(col("__k"))
      .orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = tagged
      .withColumn("__m", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val outLeft = leftCols.map(c => col(s"__l.$c").as(c))
    val outRight = rightPayload.map(c => col(s"__m.$c").as(s"$rightPrefix$c"))
    matched.select(outLeft ++ outRight: _*)
  }
}
