package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Per-key LIST state through Spark 4's `transformWithState` —
  * completing the typed-state trio (ValueState q324, MapState q351,
  * ListState here) with an operator that genuinely NEEDS the full
  * per-key history: the exact per-user purchase MEDIAN, which no
  * bounded accumulator computes. Each purchase's integer cents is
  * appended to a `ListState[Long]`; on snapshot the list is sorted
  * and the lower median (the actual data value at integer rank
  * ⌊(n−1)/2⌋+1 — q99's rounding-free discrete-quantile rule) is
  * emitted with the count.
  *
  * Timer discipline and snapshot tagging are [[MapStateRevenue]]'s:
  * per-key timer just past the key's last real event (never
  * watermark+1 — the silent-loss trap documented there), a global
  * `cents < 0` sentinel drives the final watermark, snapshots tag the
  * strictly-increasing timer expiry and the judged frame keeps the
  * latest per key.
  *
  * Scale: one shuffle on the key; state is O(events per key) integer
  * cents (the inherent cost of an exact holistic aggregate — a
  * production pipeline caps it with TTL or switches to a sketch; the
  * sort is per-key at snapshot time, RocksDB-backed until then).
  */
object ListStateMedian {

  /** `cents < 0` marks a watermark-driver sentinel (never data). */
  case class MEvent(key: Long, ts: Timestamp, cents: Long)

  case class MedianRow(key: Long, n: Long, medianCents: Long, tagMs: Long)

  private def usec(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  class MedianProcessor extends StatefulProcessor[Long, MEvent, MedianRow] {
    @transient private var vals: ListState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      vals = getHandle.getListState[Long](
        "vals", Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(
        key: Long, rows: Iterator[MEvent], tv: TimerValues): Iterator[MedianRow] = {
      var lastUs = -1L
      rows.foreach { e =>
        if (e.cents >= 0L) {
          vals.appendValue(e.cents)
          lastUs = math.max(lastUs, usec(e.ts))
        }
      }
      if (lastUs >= 0L) {
        getHandle.listTimers().toSeq.foreach(getHandle.deleteTimer)
        getHandle.registerTimer(math.floorDiv(lastUs + 999L, 1000L) + 1L)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[MedianRow] = {
      val sorted = vals.get().toArray.sorted
      if (sorted.isEmpty) Iterator.empty
      else {
        val n = sorted.length.toLong
        // lower median: 1-indexed rank floor((n-1)/2)+1 = 0-indexed (n-1)/2
        val med = sorted(((n - 1) / 2).toInt)
        Iterator.single(MedianRow(key, n, med, info.getExpiryTimeInMs()))
      }
    }
  }

  /** Per-user exact purchase medians through [[MedianProcessor]]. */
  def medians(ds: Dataset[MEvent]): Dataset[MedianRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).transformWithState(
      new MedianProcessor, TimeMode.EventTime(), OutputMode.Append())
  }
}
