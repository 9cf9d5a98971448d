package graft.streaming

import java.sql.Timestamp

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, ListState, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** Per-key LIST state through Spark 4's `transformWithState` —
  * completing the typed-state trio (ValueState q324, MapState q351,
  * ListState here) with an operator that genuinely NEEDS the full
  * per-key history: the exact per-user purchase MEDIAN, which no
  * bounded accumulator computes. Each purchase's integer cents is
  * appended to a `ListState`; on snapshot the retained values are
  * sorted and the lower median (the actual data value at integer rank
  * ⌊(n−1)/2⌋+1 — q99's rounding-free discrete-quantile rule) is
  * emitted with the exact count.
  *
  * Timer discipline and snapshot tagging are [[MapStateRevenue]]'s:
  * per-key timer just past the key's last real event (never
  * watermark+1 — the silent-loss trap documented there), monotone
  * re-arm (max of existing timers and this batch's expiry, so
  * out-of-order batches cannot regress the tag), a global `cents < 0`
  * sentinel drives the final watermark, snapshots tag the
  * strictly-increasing timer expiry and the judged frame keeps the
  * latest per key.
  *
  * 100 TB guard — the `maxKept` CAP: unbounded per-key history is the
  * inherent cost of an exact holistic aggregate, so the processor
  * carries its own bound instead of a comment. When a key's retained
  * list would exceed `maxKept`, it COMPACTS by level-sampling (the
  * Manku-Rajagopalan-Lindsay idea): every event carries a
  * deterministic 64-bit hash; level L retains exactly the events with
  * L trailing zero bits (a nested uniform ~2^-L subsample), and each
  * compaction bumps L and re-filters the retained list — O(cap) work,
  * amortized O(1) per event, no RNG state. Over-cap keys report the
  * sample median (error ~1/√kept) while `n` stays EXACT (tracked in a
  * ValueState); under-cap keys (every key of the judged q352, which
  * uses the default unbounded dial) retain everything and the median
  * is exact. `nKept` is emitted so callers — and the cap spec — can
  * see the guard engage.
  */
object ListStateMedian {

  /** `cents < 0` marks a watermark-driver sentinel (never data). */
  case class MEvent(key: Long, ts: Timestamp, cents: Long)

  case class MedianRow(key: Long, n: Long, medianCents: Long, nKept: Long,
      tagMs: Long)

  /** One retained sample: the value + its level-sampling hash. */
  case class KV(cents: Long, h: Long)

  /** Exact event count, retained count, current sampling level. */
  case class Meta(nTotal: Long, nKept: Long, level: Int)

  private def usec(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** splitmix64 ([[graft.expr.Splitmix]] — the shared finalizer) over
    * (cents, event time, sequence) — the sequence term makes duplicate
    * (cents, ts) events sample independently. Replay-deterministic
    * ONLY because the caller assigns `seq` over a canonically SORTED
    * view of each batch's events: the raw iterator order out of the
    * shuffle is not stable across task retries, so hashing the arrival
    * index directly would let a retried micro-batch retain a different
    * sample than the original attempt.
    */
  private def sampleHash(cents: Long, us: Long, seq: Long): Long =
    graft.expr.Splitmix.mix64(
      cents * 0x9E3779B97F4A7C15L + us * 0xC2B2AE3D27D4EB4FL + seq)

  private def keptAt(h: Long, level: Int): Boolean =
    (h & ((1L << level) - 1L)) == 0L

  class MedianProcessor(maxKept: Int = Int.MaxValue)
      extends StatefulProcessor[Long, MEvent, MedianRow] {
    require(maxKept >= 2, s"maxKept must be >= 2, got $maxKept")
    @transient private var vals: ListState[KV] = _
    @transient private var meta: ValueState[Meta] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit = {
      vals = getHandle.getListState[KV](
        "vals", Encoders.product[KV], TTLConfig.NONE)
      meta = getHandle.getValueState[Meta](
        "meta", Encoders.product[Meta], TTLConfig.NONE)
    }

    override def handleInputRows(
        key: Long, rows: Iterator[MEvent], tv: TimerValues): Iterator[MedianRow] = {
      var m = if (meta.exists()) meta.get() else Meta(0L, 0L, 0)
      var lastUs = -1L
      val buf = ArrayBuffer.empty[KV]
      // Canonical (ts, cents) order BEFORE sequence assignment: the
      // engine sorts micro-batch input by grouping key only, so the
      // within-key row order can differ between a task attempt and its
      // retry — hashing the raw arrival index would make the retained
      // sample attempt-dependent. Sorting costs O(batch rows for this
      // key) memory, the same class as the snapshot's own sort.
      val evs = rows.filter(_.cents >= 0L).toArray
        .sortBy(e => (usec(e.ts), e.cents))
      evs.foreach { e =>
        m = m.copy(nTotal = m.nTotal + 1L)
        val h = sampleHash(e.cents, usec(e.ts), m.nTotal)
        if (keptAt(h, m.level)) buf += KV(e.cents, h)
        lastUs = math.max(lastUs, usec(e.ts))
      }
      if (buf.nonEmpty) vals.appendList(buf.toArray)
      m = m.copy(nKept = m.nKept + buf.length)
      // Compact while over cap: bump the level, keep the nested
      // subsample. The min-hash fallback keeps the sample non-empty
      // even in the astronomically unlikely all-filtered case.
      while (m.nKept > maxKept) {
        val all = vals.get().toArray
        val lvl = m.level + 1
        val survivors = {
          val f = all.filter(kv => keptAt(kv.h, lvl))
          if (f.nonEmpty) f else Array(all.minBy(_.h))
        }
        vals.clear()
        vals.appendList(survivors)
        m = m.copy(nKept = survivors.length.toLong, level = lvl)
      }
      meta.update(m)
      if (lastUs >= 0L) {
        // Monotone re-arm — [[MapStateRevenue]]'s discipline.
        val newExpiry = math.floorDiv(lastUs + 999L, 1000L) + 1L
        val existing = getHandle.listTimers().toSeq
        existing.foreach(getHandle.deleteTimer)
        getHandle.registerTimer((existing :+ newExpiry).max)
      }
      Iterator.empty
    }

    override def handleExpiredTimer(
        key: Long, tv: TimerValues, info: ExpiredTimerInfo): Iterator[MedianRow] = {
      val sorted = vals.get().map(_.cents).toArray.sorted
      if (sorted.isEmpty) Iterator.empty
      else {
        val m = meta.get()
        // lower median: 1-indexed rank floor((k-1)/2)+1 = 0-indexed (k-1)/2
        val med = sorted((sorted.length - 1) / 2)
        Iterator.single(
          MedianRow(key, m.nTotal, med, m.nKept, info.getExpiryTimeInMs()))
      }
    }
  }

  /** Per-user exact purchase medians through [[MedianProcessor]];
    * `maxKept` bounds per-key state (sample median once exceeded —
    * the class doc's cap contract).
    */
  def medians(ds: Dataset[MEvent], maxKept: Int = Int.MaxValue): Dataset[MedianRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key).transformWithState(
      new MedianProcessor(maxKept), TimeMode.EventTime(), OutputMode.Append())
  }
}
