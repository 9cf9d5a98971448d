package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Peak interval concurrency (max number of simultaneously-open
  * fixed-length sessions) per key — the classic ±1 sweep, restructured
  * as a DISTRIBUTED two-level scan so no task ever sorts more than one
  * (key, day) slice:
  *
  *   1. every interval emits (+1 at start, −1 at end) delta rows;
  *   2. a running sum within (key, day) windows gives the within-day
  *      concurrency profile;
  *   3. the day boundary carry-in is a prefix sum of per-day net
  *      deltas over the TINY daily aggregate (PrefixSum's pattern —
  *      the only cross-day state is |days| rows per key);
  *   4. peak(key) = max over days of carry_in + within-day peak,
  *      algebraically identical to the single global sweep, because
  *      running(t) = carry_in(day(t)) + running_within_day(t).
  *
  * Half-open interval semantics: an interval ending exactly when
  * another starts does NOT overlap it — at equal instants the −1 sorts
  * before the +1 (delta ascending). Equal (t, delta) peers all carry
  * the same delta, so the running max over any peer permutation is
  * identical — the result is deterministic without a unique
  * tie-break column.
  */
object Concurrency {

  /** @param durationSec fixed interval length added to each start
    * @return one row per key: keyCol, peak_concurrent, n_sessions
    */
  def peakConcurrent(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      durationSec: Long): DataFrame = {
    val ev = df.select(col(keyCol), col(tsCol))
    val deltas = ev
      .select(col(keyCol), col(tsCol).as("__t"), lit(1).as("__delta"))
      .union(ev.select(col(keyCol),
        (col(tsCol) + expr(s"INTERVAL '$durationSec' SECOND")).as("__t"),
        lit(-1).as("__delta")))
      .withColumn("__day", to_date(col("__t")))
    val win = Window.partitionBy(keyCol, "__day")
      .orderBy(col("__t"), col("__delta"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val daily = deltas.withColumn("__run", sum("__delta").over(win))
      .groupBy(col(keyCol), col("__day"))
      .agg(max("__run").as("__day_peak"), sum("__delta").as("__day_net"),
        count_if(col("__delta") === 1).as("__day_starts"))
    val carryW = Window.partitionBy(keyCol).orderBy("__day")
      .rowsBetween(Window.unboundedPreceding, -1)
    daily
      .withColumn("__carry", coalesce(sum("__day_net").over(carryW), lit(0L)))
      .groupBy(keyCol)
      .agg(
        max(col("__carry") + col("__day_peak")).as("peak_concurrent"),
        sum("__day_starts").as("n_sessions"))
  }
}
