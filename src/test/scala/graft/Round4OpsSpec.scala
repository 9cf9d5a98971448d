package graft

import org.apache.spark.sql.functions._

/** Construction-based ground truth for the round-3 batch-2 operators:
  * Markov transition rows (q112), LM-score accounting (q113),
  * winsorized bounds (q114), overlap-chunk coverage (q115), linear
  * interpolation values (q117), and blocked best-match (q120). All are
  * ALSO DuckDB-oracle-verified; these pin the semantics against
  * hand-computed expectations instead of a second engine.
  */
class Round4OpsSpec extends SparkSpec {
  import spark.implicits._

  test("q112 transition matrix: counts and probabilities on a hand-built stream") {
    // user 1: a -> b -> a ; user 2: a -> b. Transitions: a->b ×2, b->a ×1.
    val ev = Seq(
      (1L, 1L, "a", "2024-01-01 00:00:00"),
      (2L, 1L, "b", "2024-01-01 00:01:00"),
      (3L, 1L, "a", "2024-01-01 00:02:00"),
      (4L, 2L, "a", "2024-01-01 00:00:30"),
      (5L, 2L, "b", "2024-01-01 00:03:00"))
      .toDF("event_id", "user_id", "event_type", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    val c = ev.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type").as("cur_type"))
      .withColumn("next_type", lead(col("cur_type"), 1).over(w))
      .filter(col("next_type").isNotNull)
      .groupBy("cur_type", "next_type").agg(count(lit(1)).as("n"))
    val rows = c.collect().map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(rows == Set(("a", "b", 2L), ("b", "a", 1L)))
  }

  test("q113 LM score: OOV + seen bigrams partition every test bigram") {
    val out = Queries.q113_lm_score(spark, sf("sf0.001"))
    val bad = out.filter(col("n_oov") > col("n_bigrams") ||
      col("n_oov") < 0 || col("score") < 0).count()
    assert(bad == 0)
    assert(out.count() > 0)
    // a fully-OOV doc must score 0
    val zeroOov = out.filter(col("n_oov") === col("n_bigrams"))
      .filter(col("score") =!= 0).count()
    assert(zeroOov == 0)
  }

  test("q114 winsorize: clipped mean sits within [lo-clip raw, hi-clip raw] bounds") {
    val out = Queries.q114_winsorize(spark, sf("sf0.001")).collect()
    assert(out.nonEmpty)
    // winsorizing can only pull the mean toward the clip window; with
    // TPC-H's right-skewed prices the clipped mean must not exceed the
    // raw mean by more than the p95 cap effect — sanity: both positive,
    // and |wins - raw| < raw (no sign flips / order-of-magnitude junk)
    out.foreach { r =>
      val wins = r.getAs[Double]("wins_mean")
      val raw = r.getAs[Double]("raw_mean")
      assert(wins > 0 && raw > 0 && math.abs(wins - raw) < raw)
    }
  }

  test("q115 overlap chunks: stride-32 starts, 64-cap, full coverage, tail rule") {
    val docs = Seq((1L, (1 to 100).map(i => s"w$i").mkString(" ")),
      (2L, "a b c"), (3L, "solo"))
      .toDF("doc_id", "text")
    docs.createOrReplaceTempView("chunk_probe")
    // run the same expression pipeline as q115 against the probe
    val toks = docs.select(col("doc_id"),
      filter(split(col("text"), " "), w => length(w) > 0).as("ws"))
      .filter(size(col("ws")) > 0)
    val chunks = toks
      .select(col("doc_id"), col("ws"),
        explode(sequence(lit(0L), floor((size(col("ws")) - 1) / 32))).as("chunk_no"))
      .select(col("doc_id"), col("chunk_no"),
        slice(col("ws"), (col("chunk_no") * 32 + 1).cast("int"), lit(64)).as("chunk"))
      .collect()
    // doc 1 (100 tokens): starts 0,32,64,96 → 4 chunks of len 64,64,36,4
    val d1 = chunks.filter(_.getLong(0) == 1L).sortBy(_.getLong(1))
    assert(d1.map(_.getSeq[String](2).size).toSeq == Seq(64, 64, 36, 4))
    // consecutive chunks overlap by exactly 32 when both are full
    assert(d1(0).getSeq[String](2).drop(32) == d1(1).getSeq[String](2).take(32))
    // short docs produce exactly one chunk holding the whole doc
    val d2 = chunks.filter(_.getLong(0) == 2L)
    assert(d2.length == 1 && d2(0).getSeq[String](2) == Seq("a", "b", "c"))
    val d3 = chunks.filter(_.getLong(0) == 3L)
    assert(d3.length == 1 && d3(0).getSeq[String](2) == Seq("solo"))
  }

  test("q117 interpolation: hand-computed gap values in integer cents") {
    // one user, observations on days 1 and 4 (100.00 → 190.00):
    // day2 = 100 + floor(9000*1/3) = 13000 cents, day3 = 16000 cents
    val ev = Seq(
      (1L, 7L, 100.00, "2024-01-01 10:00:00"),
      (2L, 7L, 190.00, "2024-01-04 10:00:00"))
      .toDF("event_id", "user_id", "value", "s")
      .withColumn("ts", col("s").cast("timestamp")).drop("s")
    val tmp = java.nio.file.Files.createTempDirectory("graft_interp_").toString
    // write a probe events table and run the real query against it;
    // Tables.events expects ts as NANOSECOND LONGS (the driver files
    // are TIMESTAMP(NANOS), surfaced as long via nanosAsLong)
    ev.select(col("event_id"), (unix_micros(col("ts")) * 1000).as("ts"),
        col("user_id"), lit("x").as("event_type"), col("value"),
        lit("{}").as("props"))
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    val out = Queries.q117_interp_linear(spark, tmp)
      .collect().map(r => (r.getAs[java.sql.Date]("day").toString,
        r.getAs[Long]("est_cents"), r.getAs[Int]("interpolated")))
    assert(out.toSeq == Seq(
      ("2024-01-01", 10000L, 0), ("2024-01-02", 13000L, 1),
      ("2024-01-03", 16000L, 1), ("2024-01-04", 19000L, 0)))
  }

  test("q120 entity resolution: picked match is the true Levenshtein minimum") {
    val out = Queries.q120_entity_resolution(spark, sf("sf0.001"))
    val parts = spark.read.parquet(sf("sf0.001") + "/part.parquet")
      .select("p_partkey", "p_brand", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    out.collect().foreach { r =>
      val (qk, qn, dist) = (r.getAs[Long]("p_partkey"), r.getAs[String]("p_name"),
        r.getAs[Int]("dist"))
      val brand = parts.find(_._1 == qk).get._2
      val best = parts.filter(p => p._2 == brand && p._1 != qk)
        .map(p => lev(qn, p._3)).min
      assert(dist == best, s"probe $qk: picked $dist, true min $best")
    }
  }
}
