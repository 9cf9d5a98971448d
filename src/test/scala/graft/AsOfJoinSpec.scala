package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.streaming.StatefulSessions

case class Trade(sym: Long, trade_id: Long, t: Timestamp, qty: Long)
case class Quote(sym: Long, quote_id: Long, t: Timestamp, px: Double)

/** Construction-based ground truth for the backward as-of join and the
  * flatMapGroupsWithState session fold (batch mode) — covering exactly
  * the corners the q38/q39 oracles can't isolate: inclusive bounds,
  * equal-timestamp tie-breaks, no-match nulls, cross-key separation.
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("backward as-of join: latest quote at-or-before each trade, per key") {
    val trades = Seq(
      Trade(1, 10, ts("2024-01-01 10:00:05"), 100), // after q1, q2 → q2
      Trade(1, 11, ts("2024-01-01 10:00:02"), 200), // exactly at q2 → inclusive
      Trade(1, 12, ts("2024-01-01 09:59:59"), 300), // before any quote → null
      Trade(2, 20, ts("2024-01-01 10:00:10"), 400), // other key → its own quote
      Trade(3, 30, ts("2024-01-01 10:00:10"), 500)  // key with no quotes → null
    ).toDS().toDF()
    val quotes = Seq(
      Quote(1, 1, ts("2024-01-01 10:00:00"), 1.0),
      Quote(1, 2, ts("2024-01-01 10:00:02"), 2.0),
      Quote(1, 3, ts("2024-01-01 10:00:02"), 3.0), // tie on ts: greater id wins
      Quote(1, 4, ts("2024-01-01 10:00:06"), 4.0), // future of all trades
      Quote(2, 5, ts("2024-01-01 10:00:01"), 5.0)
    ).toDS().toDF()

    val out = AsOfJoin.backward(trades, quotes,
      keyCol = "sym", leftTsCol = "t", rightTsCol = "t",
      rightTieCol = "quote_id", rightPrefix = "q_")
      .select("trade_id", "q_quote_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(10L -> 3L, 11L -> 3L, 12L -> -1L, 20L -> 5L, 30L -> -1L))
  }

  test("as-of join output keeps every left row and all left columns") {
    val trades = Seq(Trade(1, 10, ts("2024-01-01 10:00:05"), 100)).toDS().toDF()
    val quotes = Seq(Quote(1, 1, ts("2024-01-01 10:00:00"), 1.5)).toDS().toDF()
    val out = AsOfJoin.backward(trades, quotes, "sym", "t", "t", "quote_id")
    assert(out.columns.toSeq == Seq("sym", "trade_id", "t", "qty",
      "r_quote_id", "r_t", "r_px"))
    val row = out.collect().head
    assert(row.getLong(0) == 1 && row.getLong(3) == 100 &&
      row.getDouble(6) == 1.5)
  }

  test("forward as-of join: earliest quote at-or-after each trade; ts ties take smallest id") {
    val trades = Seq(
      Trade(1, 10, ts("2024-01-01 10:00:01"), 100), // before q2/q3 tie → q2 (smaller id)
      Trade(1, 11, ts("2024-01-01 10:00:02"), 200), // exactly at tie → inclusive, q2
      Trade(1, 12, ts("2024-01-01 10:00:07"), 300), // after all quotes → null
      Trade(2, 20, ts("2024-01-01 10:00:00"), 400)  // other key
    ).toDS().toDF()
    val quotes = Seq(
      Quote(1, 1, ts("2024-01-01 10:00:00"), 1.0),
      Quote(1, 2, ts("2024-01-01 10:00:02"), 2.0),
      Quote(1, 3, ts("2024-01-01 10:00:02"), 3.0),
      Quote(1, 4, ts("2024-01-01 10:00:06"), 4.0),
      Quote(2, 5, ts("2024-01-01 10:00:01"), 5.0)
    ).toDS().toDF()

    val out = AsOfJoin.forward(trades, quotes,
      keyCol = "sym", leftTsCol = "t", rightTsCol = "t",
      rightTieCol = "quote_id", rightPrefix = "q_")
      .select("trade_id", "q_quote_id")
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    assert(out == Map(10L -> 2L, 11L -> 2L, 12L -> -1L, 20L -> 5L))
  }

  test("interval join: pairs within delta on both sides, across bin edges, never across keys") {
    import graft.operators.IntervalJoin
    val deltaUs = 60L * 1000000 // 1 minute
    val lefts = Seq(
      Trade(1, 10, ts("2024-01-01 10:01:00"), 0),
      Trade(2, 20, ts("2024-01-01 10:01:00"), 0)
    ).toDS().toDF()
    val rights = Seq(
      Quote(1, 1, ts("2024-01-01 10:00:00"), 1.0), // exactly -delta → included
      Quote(1, 2, ts("2024-01-01 10:00:30"), 2.0), // previous bin, within delta
      Quote(1, 3, ts("2024-01-01 10:01:59"), 3.0), // next bin, within delta
      Quote(1, 4, ts("2024-01-01 10:02:01"), 4.0), // beyond delta → excluded
      Quote(1, 5, ts("2024-01-01 09:59:59"), 5.0), // beyond -delta → excluded
      Quote(2, 6, ts("2024-01-01 10:01:30"), 6.0)  // other key
    ).toDS().toDF()
    val out = IntervalJoin.within(lefts, rights,
      keyCol = "sym", leftTsCol = "t", rightTsCol = "t", deltaUs = deltaUs)
      .select("trade_id", "r_quote_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out == Set((10L, 1L), (10L, 2L), (10L, 3L), (20L, 6L)))
  }

  test("batch session fold: gap boundary is exclusive-open (>= gap starts new)") {
    val gapUs = 60L * 1000000 // 1 minute
    val df = Seq(
      (1L, 1L, ts("2024-01-01 10:00:00"), 1.0),
      (1L, 2L, ts("2024-01-01 10:00:59"), 2.0), // < gap → same session
      (1L, 3L, ts("2024-01-01 10:01:59"), 4.0), // exactly gap after #2 → NEW
      (2L, 4L, ts("2024-01-01 10:00:00"), 8.0)
    ).toDF("user_id", "event_id", "ts", "value")
    val out = StatefulSessions.sessionizeBatch(
      StatefulSessions.project(df, "user_id", "event_id", "ts", "value"), gapUs)
      .collect().map(s => (s.key, s.startUs, s.n_events, s.total)).toSet
    def us(s: String) = usecOf(ts(s))
    assert(out == Set(
      (1L, us("2024-01-01 10:00:00"), 2L, 3.0),
      (1L, us("2024-01-01 10:01:59"), 1L, 4.0),
      (2L, us("2024-01-01 10:00:00"), 1L, 8.0)))
  }

  private def usecOf(t: Timestamp): Long =
    math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  test("as-of joins match the naive per-row definition on seeded random data") {
    val rnd = new scala.util.Random(42)
    val trades = (0 until 300).map(i =>
      Trade(rnd.nextInt(8), i, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i))
    val quotes = (0 until 300).map(i =>
      Quote(rnd.nextInt(8), i, new Timestamp(1700000000000L + rnd.nextInt(100000) * 1000L), i * 1.0))
    val tDf = trades.toDS().toDF()
    val qDf = quotes.toDS().toDF()

    def naiveBackward(t: Trade): Long =
      quotes.filter(q => q.sym == t.sym && !q.t.after(t.t))
        .sortBy(q => (q.t.getTime, q.quote_id)).lastOption.map(_.quote_id).getOrElse(-1L)
    def naiveForward(t: Trade): Long =
      quotes.filter(q => q.sym == t.sym && !q.t.before(t.t))
        .sortBy(q => (q.t.getTime, -q.quote_id)).headOption.map(_.quote_id).getOrElse(-1L)

    val back = AsOfJoin.backward(tDf, qDf, "sym", "t", "t", "quote_id")
      .select("trade_id", "r_quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val fwd = AsOfJoin.forward(tDf, qDf, "sym", "t", "t", "quote_id")
      .select("trade_id", "r_quote_id").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap

    trades.foreach { t =>
      assert(back(t.trade_id) == naiveBackward(t), s"backward mismatch for $t")
      assert(fwd(t.trade_id) == naiveForward(t), s"forward mismatch for $t")
    }
  }

  test("interval join matches the naive range-join definition on seeded random data") {
    import graft.operators.IntervalJoin
    val rnd = new scala.util.Random(7)
    val deltaUs = 5000L * 1000L // 5 seconds
    val lefts = (0 until 200).map(i =>
      Trade(rnd.nextInt(5), i, new Timestamp(1700000000000L + rnd.nextInt(60000)), 0))
    val rights = (0 until 200).map(i =>
      Quote(rnd.nextInt(5), i, new Timestamp(1700000000000L + rnd.nextInt(60000)), 0.0))
    val expected = (for {
      l <- lefts; r <- rights
      if l.sym == r.sym && math.abs(l.t.getTime - r.t.getTime) * 1000L <= deltaUs
    } yield (l.trade_id, r.quote_id)).toSet
    val got = IntervalJoin.within(
      lefts.toDS().toDF(), rights.toDS().toDF(), "sym", "t", "t", deltaUs)
      .select("trade_id", "r_quote_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected,
      s"missing=${expected -- got}, extra=${got -- expected}")
  }

  test("sort-based exact quantiles equal the builtin buffering percentile on lineitem") {
    import graft.operators.Quantiles
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val sortBased = Quantiles.exactByGroup(li, "l_returnflag", "l_extendedprice", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"),
        array(ps.map(lit): _*)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(sortBased.keySet == builtin.keySet)
    for (k <- builtin.keySet; i <- ps.indices)
      assert(math.abs(sortBased(k)(i) - builtin(k)(i)) < 1e-6,
        s"group $k p=${ps(i)}: sort=${sortBased(k)(i)} builtin=${builtin(k)(i)}")
  }

  test("two-pass histogram quantiles equal the builtin on lineitem (fully parallel path)") {
    import graft.operators.Quantiles
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val ps = Seq(0.0, 0.25, 0.5, 0.75, 0.95, 1.0)
    val hist = Quantiles.exactByGroupHistogram(li, "l_returnflag", "l_extendedprice", ps, buckets = 512)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val builtin = li.groupBy("l_returnflag")
      .agg(percentile(col("l_extendedprice"), array(ps.map(lit): _*)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(hist.keySet == builtin.keySet)
    for (k <- builtin.keySet; i <- ps.indices)
      assert(math.abs(hist(k)(i) - builtin(k)(i)) < 1e-6,
        s"group $k p=${ps(i)}: hist=${hist(k)(i)} builtin=${builtin(k)(i)}")
  }

  test("both exact-quantile paths survive heavy duplicate values (seeded)") {
    import graft.operators.Quantiles
    val rnd = new scala.util.Random(11)
    // many ties: values drawn from just 10 levels across 3 groups
    val rows = (0 until 3000).map(_ =>
      (rnd.nextInt(3).toString, rnd.nextInt(10).toDouble))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.1, 0.5, 0.9, 1.0)
    val builtin = df.groupBy("g")
      .agg(percentile(col("v"), array(ps.map(lit): _*)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sorted = Quantiles.exactByGroup(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val hist = Quantiles.exactByGroupHistogram(df, "g", "v", ps, buckets = 16)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    for (k <- builtin.keySet; i <- ps.indices) {
      assert(math.abs(sorted(k)(i) - builtin(k)(i)) < 1e-9,
        s"sort path: group $k p=${ps(i)}")
      assert(math.abs(hist(k)(i) - builtin(k)(i)) < 1e-9,
        s"hist path: group $k p=${ps(i)}")
    }
  }

  test("both exact-quantile paths ignore null values like the builtin percentile") {
    import graft.operators.Quantiles
    val rnd = new scala.util.Random(13)
    // ~20% nulls; if nulls entered the population they would sort first
    // and shift every rank in the sort path
    val rows = (0 until 2000).map(_ =>
      (rnd.nextInt(3).toString,
        if (rnd.nextInt(5) == 0) None else Some(rnd.nextDouble() * 100)))
    val df = rows.toDF("g", "v")
    val ps = Seq(0.0, 0.25, 0.5, 0.9, 1.0)
    val builtin = df.groupBy("g")
      .agg(percentile(col("v"), array(ps.map(lit): _*)).as("q"))
      .collect().map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    val sorted = Quantiles.exactByGroup(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val hist = Quantiles.exactByGroupHistogram(df, "g", "v", ps, buckets = 32)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    for (k <- builtin.keySet; i <- ps.indices) {
      assert(math.abs(sorted(k)(i) - builtin(k)(i)) < 1e-9,
        s"sort path with nulls: group $k p=${ps(i)}")
      assert(math.abs(hist(k)(i) - builtin(k)(i)) < 1e-9,
        s"hist path with nulls: group $k p=${ps(i)}")
    }
  }

  test("percentile_approx (the 100 TB scale path) tracks exact percentile within 0.5%") {
    val li = spark.read.parquet(s"${sf("sf0.01")}/lineitem.parquet")
    val row = li.agg(
      percentile(col("l_extendedprice"), lit(0.5)).as("exact"),
      percentile_approx(col("l_extendedprice"), lit(0.5), lit(10000)).as("approx"))
      .collect().head
    val (exact, approx) = (row.getDouble(0), row.getDouble(1))
    assert(math.abs(approx - exact) / exact < 0.005,
      s"approx=$approx drifted from exact=$exact")
  }
}
