package graft

import org.apache.spark.sql.functions._

import graft.operators.{BloomDedup, HeavyHitters, PrefixSum, ZOrder}

/** Construction-based ground truth for the round-3 operators: bloom
  * dedup exactness (q80), z-order tile locality (q84), passage dedup
  * accounting (q83), and merge semantics (q88).
  */
class Round3OpsSpec extends SparkSpec {
  import spark.implicits._

  test("bloom dedup returns exactly the anti-join result at every fpp") {
    val corpus = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma")).toDF("id", "k")
    val incoming = Seq(
      (10L, "alpha"), (11L, "delta"), (12L, "beta"),
      (13L, "epsilon"), (14L, "zeta")).toDF("id", "k")
    val want = incoming.join(corpus.select(col("k").as("ck")),
      col("k") === col("ck"), "left_anti")
      .select("id").as[Long].collect().sorted
    // a tight fpp routes most rows around the join; a sloppy fpp (0.5)
    // forces many false positives through the confirm join — the
    // result must be identical either way
    for (fpp <- Seq(0.01, 0.5)) {
      val got = BloomDedup.newRows(incoming, corpus, "k", 100L, fpp)
        .select("id").as[Long].collect().sorted
      assert(got.sameElements(want), s"fpp=$fpp")
    }
  }

  test("bloom dedup: everything new when corpus is disjoint, nothing when equal") {
    val corpus = Seq("a", "b", "c").toDF("k")
    val fresh = Seq("x", "y").toDF("k")
    assert(BloomDedup.newRows(fresh, corpus, "k", 10L).count() == 2)
    assert(BloomDedup.newRows(corpus, corpus, "k", 10L).count() == 0)
  }

  test("null keys: bloom dedup keeps them as new; heavy hitters counts them as a group") {
    // null never equals a corpus key → the null-key row must survive
    val corpus = Seq("a", "b").toDF("k")
    val incoming = Seq(Some("a"), None, Some("x")).toDF("k")
    val got = BloomDedup.newRows(incoming, corpus, "k", 10L)
      .select("k").collect().map(r => Option(r.getString(0))).toSet
    assert(got == Set(None, Some("x")))
    // SQL GROUP BY counts the null group — the sketch path must not lose it
    val rows = (Seq.fill(10)(Option("hot")) ++ Seq.fill(7)(Option.empty[String]) ++
      Seq(Some("rare"))).toDF("k")
    val hh = HeavyHitters.atLeast(rows, "k", 5L)
      .collect().map(r => Option(r.getString(0)) -> r.getLong(1)).toMap
    assert(hh == Map(Some("hot") -> 10L, None -> 7L))
  }

  test("z-value interleaves bits: zvalue(x,y) reproduces hand-computed mortons") {
    // morton(x=5=101b, y=3=011b): bits x->even, y->odd positions
    // x: 1<<0, 0<<2, 1<<4 = 17; y: 1<<1, 1<<3, 0<<5 = 10; z = 27
    val df = Seq((5L, 3L), (0L, 0L), (255L, 255L)).toDF("x", "y")
    val got = df.select(ZOrder.zvalue(col("x"), col("y")).as("z"))
      .as[Long].collect()
    assert(got.sameElements(Array(27L, 0L, 65535L)))
  }

  test("a 64-z-value tile bounds both dimensions to an 8x8 square") {
    // all (x,y) in [0,256)^2 on a coarse grid; dropping the low 6 z
    // bits (3 x-bits + 3 y-bits) must bound each dim's spread to < 8
    val pts = for (x <- 0L until 256L by 3; y <- 0L until 256L by 7) yield (x, y)
    val spans = pts.toDF("x", "y")
      .withColumn("tile", shiftright(ZOrder.zvalue(col("x"), col("y")), 6))
      .groupBy("tile")
      .agg((max("x") - min("x")).as("dx"), (max("y") - min("y")).as("dy"))
      .agg(max("dx"), max("dy")).as[(Long, Long)].head()
    assert(spans._1 <= 7 && spans._2 <= 7)
  }

  test("passage dedup keeps each distinct passage exactly once corpus-wide") {
    val out = Queries.q83_passage_dedup(spark, sf())
    val (totalKept, total) = out.agg(sum("n_kept"), sum("n_passages"))
      .as[(Long, Long)].head()
    assert(totalKept <= total)
    // kept passages == distinct passages in the corpus (first-wins is a
    // bijection onto the distinct passage set)
    val distinctPassages = {
      val chunk = 16
      spark.read.parquet(s"${sf()}/documents.parquet")
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
        .select(posexplode(transform(
          sequence(lit(0), (ceil(size(col("ws")) / lit(chunk.toDouble)) - 1).cast("int")),
          i => array_join(slice(col("ws"), i * chunk + 1, lit(chunk)), " "))))
        .select("col").distinct().count()
    }
    assert(totalKept == distinctPassages)
  }

  test("heavy hitters equal GROUP BY HAVING exactly, at tight and sloppy sketch sizes") {
    // skewed construction: 'hot' 500x, 'warm' 50x, 449 singletons —
    // a sloppy sketch (eps=0.5 -> width 4) overestimates heavily and
    // must still return exactly the >=50 set after the confirm pass
    val rows = (Seq.fill(500)("hot") ++ Seq.fill(50)("warm") ++
      (0 until 449).map(i => s"tail_$i")).toDF("k")
    val want = rows.groupBy("k").count().filter(col("count") >= 50)
      .select("k").as[String].collect().sorted
    for (eps <- Seq(0.001, 0.5)) {
      val got = HeavyHitters.atLeast(rows, "k", 50L, eps = eps)
        .select("k").as[String].collect().sorted
      assert(got.sameElements(want), s"eps=$eps")
    }
  }

  test("globalRank matches the single-window row_number over a composite order") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 500).map(i => (rnd.nextInt(20).toDouble, i.toLong))
      .toDF("v", "id")
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("v").asc, col("id").asc)
    val want = df.withColumn("r", row_number().over(w).cast("long"))
      .select("id", "r").as[(Long, Long)].collect().toMap
    // force the distributed two-pass path (smallInputBytes = 0)
    val got = PrefixSum.globalRank(df, Seq("v", "id"), "r", smallInputBytes = 0L)
      .select("id", "r").as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("sketch-routed operators stay exact on randomized inputs (seeded trials)") {
    val rnd = new scala.util.Random(23)
    for (trial <- 1 to 3) {
      // zipfian-ish key pool: few hot keys, long tail
      val keys = (0 until 800).map { _ =>
        val r = rnd.nextInt(100)
        if (r < 40) s"hot_${rnd.nextInt(3)}"
        else if (r < 70) s"warm_${rnd.nextInt(20)}"
        else s"cold_${rnd.nextInt(500)}"
      }
      val df = keys.toDF("k")
      val thresh = 1L + rnd.nextInt(30)
      val wantHH = df.groupBy("k").count().filter(col("count") >= thresh)
        .select("k").as[String].collect().sorted
      val gotHH = HeavyHitters.atLeast(df, "k", thresh, eps = 0.1)
        .select("k").as[String].collect().sorted
      assert(gotHH.sameElements(wantHH), s"HH trial $trial thresh $thresh")

      val corpus = keys.take(300).toDF("k").distinct()
      val incoming = keys.drop(300).toDF("k")
      val wantNew = incoming.join(corpus.select(col("k").as("ck")),
        col("k") === col("ck"), "left_anti").count()
      val gotNew = BloomDedup.newRows(incoming, corpus, "k", 1000L,
        fpp = 0.05 + rnd.nextDouble() * 0.4).count()
      assert(gotNew == wantNew, s"bloom trial $trial")
    }
  }

  test("weighted sample is deterministic and biased toward heavier docs") {
    val a = Queries.q95_weighted_sample(spark, sf())
      .select("doc_id").as[Long].collect().toSet
    val b = Queries.q95_weighted_sample(spark, sf())
      .select("doc_id").as[Long].collect().toSet
    assert(a == b && a.size == 50)
    // mean weight of the A-ES draw must exceed the corpus mean
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val corpusMean = docs.agg(avg("n_chars")).as[Double].head()
    val sampleMean = docs.filter(col("doc_id").isInCollection(a))
      .agg(avg("n_chars")).as[Double].head()
    assert(sampleMean > corpusMean,
      s"sample mean $sampleMean should exceed corpus mean $corpusMean")
  }

  test("approx quantile sketch lands within tolerance of the exact builtin") {
    // q99 judges the DISCRETE quantiles as hash-exact values and the
    // interpolating operator + sketch via flags; this test pins the
    // flags engine-side and the disc values against the builtin exact
    // percentile's bracketing (disc ≤ builtin interp ≤ next value).
    val got = Queries.q99_approx_quantiles(spark, sf())
      .select("l_returnflag", "p50_disc", "p95_disc",
        "p50_apx_ok", "p95_apx_ok", "p50_interp_ok", "p95_interp_ok")
      .as[(String, Double, Double, Boolean, Boolean, Boolean, Boolean)].collect()
    assert(got.nonEmpty)
    val exact = spark.read.parquet(s"${sf()}/lineitem.parquet")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_extendedprice, 0.5)").as("p50"),
        expr("percentile(l_extendedprice, 0.95)").as("p95"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    got.foreach { case (flag, d50, d95, ok50, ok95, in50, in95) =>
      assert(ok50 && ok95, s"$flag sketch outside the 1% contract")
      assert(in50 && in95, s"$flag interpolation escaped its bracket")
      // the disc (lower-bracket) value can sit at most one data point
      // below the continuous quantile, never above it
      assert(d50 <= exact(flag)._1 && d95 <= exact(flag)._2,
        s"$flag disc quantile above the continuous one")
    }
  }

  test("merge upsert: row count follows the set algebra of base/updates/inserts/deletes") {
    val dir = sf()
    val orders = spark.read.parquet(s"$dir/orders.parquet")
    val baseN = orders.filter(pmod(col("o_orderkey"), lit(7)) =!= 0).count()
    val delInBase = orders.filter(
      pmod(col("o_orderkey"), lit(7)) =!= 0 &&
        pmod(col("o_orderkey"), lit(3)) === 0 &&
        pmod(col("o_orderkey"), lit(5)) === 0).count()
    val inserts = orders.filter(
      pmod(col("o_orderkey"), lit(7)) === 0 &&
        pmod(col("o_orderkey"), lit(3)) === 0 &&
        pmod(col("o_orderkey"), lit(5)) =!= 0).count()
    val mergedN = Queries.q88_merge_upsert(spark, dir)
      .agg(sum("n")).as[Long].head()
    assert(mergedN == baseN - delInBase + inserts)
  }
}
