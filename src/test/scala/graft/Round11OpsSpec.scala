package graft

import org.apache.spark.sql.functions._

/** Ground truth for the q328-q331 additions: the streaming LEFT OUTER
  * join checked against its own batch form (the eviction-completeness
  * claim — every unmatched click must flush before AvailableNow
  * drains), batching/mixing invariants that hold by construction at
  * any SF, and the hierarchy rollup hand-computed on an engineered
  * 25-key decimal tree.
  */
class Round11OpsSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  // ---- q328 stream outer join -----------------------------------------

  test("stream outer join: streaming result equals the batch left join (all outer rows flushed)") {
    val dir = sf()
    val streamed = Queries.all("q328_stream_outer_join")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("campaign"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("value"))
    val batch = c.join(p,
        col("user_id") === col("p_user") && col("pts") >= col("cts") &&
          col("pts") < col("cts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      .groupBy(coalesce(col("campaign"), lit(-1L)).as("campaign"))
      .agg(count(col("pts")).as("n_pairs"),
        count(when(col("pts").isNull, lit(1))).as("n_unmatched"),
        round(sum(coalesce(col("value"), lit(0.0))), 2).as("total_value"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch,
      s"streaming vs batch outer join diverged:\n missing=${batch -- streamed}\n extra=${streamed -- batch}")
    // the outer path actually fired: at least one campaign has
    // unmatched clicks in this data
    assert(streamed.exists(_._3 > 0), "no unmatched click emitted — " +
      "the watermark-eviction path was not exercised")
  }

  // ---- q329 length batching -------------------------------------------

  test("length batching: sorted order never pads more than arrival order; batch counts agree") {
    val rows = Queries.all("q329_length_batching")(spark, sf())
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val (nbS, padS, realS, wasteS) = rows("1_length_sorted")
    val (nbA, padA, realA, wasteA) = rows("2_arrival")
    assert(nbS == nbA, "same corpus, same B => same batch count")
    assert(realS == realA, "real token mass is order-invariant")
    assert(padS >= realS && padA >= realA, "padding can only add")
    // the defining guarantee: grouping similar lengths cannot lose
    assert(padS <= padA,
      s"length-sorted padded $padS > arrival padded $padA")
    assert(wasteS >= 0.0 && wasteS <= wasteA && wasteA < 100.0)
  }

  // ---- q330 epoch mix --------------------------------------------------

  test("epoch mix: expansion = n_docs * repeat, factors in [1,4] and monotone in corpus size") {
    val rows = Queries.all("q330_epoch_mix")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nDocs, rep, nExp, mn, mx, ck) =>
      assert(rep >= 1 && rep <= 4, s"$lang repeat $rep out of [1,4]")
      assert(nExp == nDocs * rep, s"$lang expansion $nExp != $nDocs*$rep")
      assert(mn >= 0 && mx < 1000000007L && ck >= 0 && ck < 1000000007L,
        s"$lang interleave keys escaped the modulus")
    }
    // upsample = N / (Z * sqrt(n)) is strictly decreasing in n, so the
    // capped ceil is non-increasing as corpora grow
    val byN = rows.sortBy(_._2)
    byN.sliding(2).foreach {
      case Array(a, b) => assert(a._3 >= b._3,
        s"repeat factor must not grow with corpus size: $a then $b")
      case _ => ()
    }
  }

  // ---- q332 recursive CTE ---------------------------------------------

  test("recursive CTE rollup equals the closed-form path enumeration, and really plans UnionLoop") {
    val rec = Queries.all("q332_sql_recursive")(spark, sf())
    val closed = Queries.all("q331_hierarchy_rollup")(spark, sf())
    assert(rec.collect().toSeq == closed.collect().toSeq,
      "recursion and arithmetic path enumeration must agree")
    val plan = rec.queryExecution.executedPlan.toString
    assert(plan.contains("UnionLoop"),
      s"expected the recursive-CTE UnionLoop surface in the plan:\n$plan")
  }

  // ---- q340 stream full outer join --------------------------------------

  test("stream full outer join: both unmatched directions flush and equal the batch full join") {
    val dir = sf()
    val r = Queries.all("q340_stream_full_join")(spark, dir).collect()(0)
    val streamed = (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("value"))
    val matched = col("user_id").isNotNull && col("p_user").isNotNull
    val b = c.join(p,
        col("user_id") === col("p_user") && col("pts") >= col("cts") &&
          col("pts") < col("cts") + expr("INTERVAL 30 MINUTES"),
        "full_outer")
      .agg(count(when(matched, lit(1))).as("n_pairs"),
        count(when(col("p_user").isNull, lit(1))).as("n_click_only"),
        count(when(col("user_id").isNull, lit(1))).as("n_purchase_only"),
        round(sum(when(matched, col("value")).otherwise(lit(0.0))), 2)
          .as("matched_value"))
      .collect()(0)
    val batch = (b.getLong(0), b.getLong(1), b.getLong(2), b.getDouble(3))
    assert(streamed == batch, s"streamed $streamed vs batch $batch")
    // both outer directions really fired
    assert(streamed._2 > 0 && streamed._3 > 0,
      s"expected unmatched rows on BOTH sides, got $streamed")
  }

  // ---- q341 stream-static anti dedup -------------------------------------

  test("stream anti dedup: replayed rows are dropped, truly-new rows all arrive") {
    val dir = sf()
    val out = Queries.all("q341_stream_anti_dedup")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val cutoff = ev.agg((max(col("ts")) - expr("INTERVAL 7 DAYS")).as("c"))
    val expected = ev.crossJoin(broadcast(cutoff)).filter(col("ts") >= col("c"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n_new"), round(sum("value"), 2).as("new_value"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(out == expected, s"missing=${expected -- out} extra=${out -- expected}")
    // the topic really carried replays for the anti-join to drop
    val replays = ev.crossJoin(broadcast(cutoff))
      .filter(col("ts") < col("c") && col("event_id") % 97 === 0).count()
    assert(replays > 0, "no replay rows staged — the dedup path was not exercised")
  }

  // ---- q343/q344 multi-source union + dedup→agg chains --------------------

  test("stream union sources: min-watermark policy drains every real day, sentinels never emit") {
    val dir = sf()
    val streamed = Queries.all("q343_stream_union_sources")(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    val ev = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type").isin("click", "purchase"))
    val batch = ev.groupBy(date_trunc("day", col("ts")).as("day"),
        col("event_type").as("kind"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
    assert(streamed.map(_._2) == Set("click", "purchase"))
  }

  test("stream dedup→window chain equals batch count(DISTINCT) per day") {
    val dir = sf()
    val streamed = Queries.all("q344_stream_dedup_window")(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    val batch = spark.read.parquet(s"$dir/events.parquet")
      .filter(col("event_type") === "purchase")
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(countDistinct("user_id").as("n"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1))).toSet
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
  }

  // ---- q345 native session_window streaming -------------------------------

  test("native session_window streaming equals the batch session_window operator") {
    val dir = sf()
    val streamed = Queries.all("q345_session_window_stream")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    // Tables.events, not a raw read: the raw parquet ts decodes as NTZ
    // here and Row.getTimestamp would see LocalDateTime (the README
    // gotcha); the judged query's topics come through the same loader.
    val batch = graft.sources.Tables.events(spark, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(session_window(col("ts"), "6 hours").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), round(sum("value"), 2).as("total"))
      .select(col("user_id"), col("w.start").as("s_start"),
        col("n_events"), col("total"))
      .collect().map(r => (r.getLong(0), r.getTimestamp(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch,
      s"missing=${batch -- streamed} extra=${streamed -- batch}")
    // multi-event sessions exist (the merge path really ran)
    assert(streamed.exists(_._3 > 1), "no merged session found")
  }

  // ---- q334 lateral top-k ---------------------------------------------

  test("lateral top-k: Catalyst decorrelates to a partitioned rank, never a per-row loop") {
    import org.apache.spark.sql.execution.window.WindowGroupLimitExec
    val df = Queries.all("q334_lateral_topk")(spark, sf())
    val p = df.queryExecution.executedPlan
    val s = p.toString
    assert(!s.contains("BroadcastNestedLoopJoin") && !s.contains("CartesianProduct"),
      s"lateral subquery executed as a per-row loop:\n$s")
    // The LIMIT-3-per-nation shape must surface as a rank computation
    // partitioned on the correlation key (WindowGroupLimit is Spark's
    // optimized form; a partitioned WindowExec is the general one).
    val ranked = planNodes(p).exists {
      case _: WindowGroupLimitExec => true
      case w: org.apache.spark.sql.execution.window.WindowExec =>
        w.partitionSpec.nonEmpty
      case _ => false
    }
    assert(ranked, s"expected a partitioned rank/group-limit in:\n$s")
    // and the result is really top-3 per nation
    val rows = df.collect()
    assert(rows.groupBy(_.getString(0)).forall(_._2.length <= 3))
  }

  // ---- q335 sql pipe syntax -------------------------------------------

  test("sql pipe syntax lowers onto the classic pushdown + two-phase aggregate plan") {
    val p = Queries.all("q335_sql_pipe")(spark, sf())
      .queryExecution.executedPlan.toString
    assert(p.contains("HashAggregate"), s"no hash aggregate in:\n$p")
    assert(p.contains("EqualTo(o_orderstatus,O)"),
      s"pipe WHERE stage did not push to the scan:\n$p")
  }

  // ---- q333 chained stateful streaming --------------------------------

  test("stream join + windowed agg: chained stateful streaming equals the batch rollup") {
    val dir = sf()
    val streamed = Queries.all("q333_stream_join_window")(spark, dir)
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    val ev = spark.read.parquet(s"$dir/events.parquet")
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("campaign"),
        col("ts").as("cts"))
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("ts").as("pts"), col("value"))
    val batch = c.join(p,
        col("user_id") === col("p_user") && col("pts") >= col("cts") &&
          col("pts") < col("cts") + expr("INTERVAL 30 MINUTES"))
      .groupBy(date_trunc("day", col("pts")).as("day"),
        coalesce(col("campaign"), lit(-1L)).as("campaign"))
      .agg(count(lit(1)).as("n_pairs"),
        round(sum("value"), 2).as("total_value"))
      .collect().map(r => (r.getTimestamp(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).toSet
    assert(streamed == batch,
      s"chained stateful streaming diverged:\n missing=${batch -- streamed}\n extra=${streamed -- batch}")
    assert(streamed.map(_._1).size > 1,
      "expected multiple day windows — the window state path was not exercised")
  }

  // ---- q336 cross-corpus LSH decontamination ---------------------------

  test("lsh decontamination: planted cross-split near-dups flagged, clean doc untouched") {
    val dir = tmp("graft_decon_")
    // doc 5 is the benchmark slice (5 % 10 == 5). doc 2 copies it
    // exactly (j=1), doc 3 shares 5 of 7 distinct 3-shingles
    // (j = 5/7 ≈ 0.71 ≥ 0.5), doc 1 is unrelated (j = 0).
    val a = "alpha beta gamma delta epsilon zeta eta theta"
    Seq(
      (5L, a, "en", "bench", a.length.toLong),
      (1L, "one two three four five six seven eight", "en", "web", 40L),
      (2L, a, "en", "books", a.length.toLong),
      (3L, "alpha beta gamma delta epsilon zeta eta iota", "en", "web", 45L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val rows = Queries.all("q336_lsh_decontamination")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(rows == Seq(("books", 1L, 1L), ("web", 1L, 1L)), s"got $rows")
  }

  // ---- q337 runtime bloom join ------------------------------------------

  test("runtime bloom join: InjectRuntimeFilter plants a might-contain probe below the fact shuffle") {
    val keep = Queries.runtimeBloomConfs // the SAME confs the query wraps
    val prev = keep.map { case (k, _) => k -> spark.conf.getOption(k) }
    keep.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val agg = Queries.runtimeBloomAgg(spark, sf())
      val p = agg.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter"),
        s"no runtime bloom filter injected:\n$p")
      // and the judged wrapper returns the same (bounded) rows
      val wrapped = Queries.all("q337_runtime_bloom_join")(spark, sf())
        .collect().map(_.toString).sorted.toSeq
      assert(wrapped == agg.collect().map(_.toString).sorted.toSeq)
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  // ---- q338 eval holdout ------------------------------------------------

  test("eval holdout: exactly min(k, n) per language, stable across re-derivation") {
    val dir = tmp("graft_hold_")
    // lang "aa": 3 docs (all selected); lang "bb": 25 docs (exactly 20)
    val rows = (1 to 3).map(i => (i.toLong, s"t$i", "aa", "s", 2L)) ++
      (100 to 124).map(i => (i.toLong, s"t$i", "bb", "s", 2L))
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val sel1 = Queries.all("q338_eval_holdout")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    val counts = sel1.groupBy(_._1).view.mapValues(_.size).toMap
    assert(counts == Map("aa" -> 3, "bb" -> 20), s"got $counts")
    // re-derivation is bit-stable (the property the picker exists for)
    val sel2 = Queries.all("q338_eval_holdout")(spark, dir)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(sel1 == sel2)
  }

  // ---- q342 text curation pipeline ---------------------------------------

  test("text curation: the funnel only narrows, and every stage really fires") {
    val rows = Queries.all("q342_text_curation")(spark, sf())
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, nDocs, nQ, nU, toks, straddle) =>
      assert(nDocs >= nQ && nQ >= nU, s"$src funnel widened: $nDocs/$nQ/$nU")
      assert(straddle <= nU, s"$src more straddlers than docs")
      assert(nU == 0 || toks >= 30 * nU,
        s"$src kept docs below the quality floor: $toks tokens for $nU docs")
    }
    // the gates are not vacuous on real data: something passes AND
    // something is dropped at each stage, and a boundary is straddled
    assert(rows.map(_._4).sum > 0, "dedup emptied the corpus")
    assert(rows.map(t => t._2 - t._3).sum > 0, "quality gate dropped nothing")
    assert(rows.map(t => t._3 - t._4).sum > 0, "near-dup stage dropped nothing")
    assert(rows.map(_._6).sum > 0, "no chunk-boundary straddler found")
  }

  // ---- q331 hierarchy rollup ------------------------------------------

  test("hierarchy rollup: hand-computed 25-key decimal tree") {
    val dir = tmp("graft_tree_")
    // custkeys 1..25, acctbal = key. Depth-1 nodes 1..9; depth-2 nodes
    // 10..25. Subtrees: node 1 = {1, 10..19} (sum 146), node 2 =
    // {2, 20..25} (sum 137), nodes 3..9 = singletons.
    (1 to 25).map(k => (k.toLong, k.toDouble)).toDF("c_custkey", "c_acctbal")
      .write.mode("overwrite").parquet(s"$dir/customer.parquet")
    val rows = Queries.all("q331_hierarchy_rollup")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(rows.toSeq == Seq(
      // depth, n_nodes, n_desc_total, max_subtree_cents, total_cents
      (1L, 9L, 25L, 14600L, 32500L),
      (2L, 16L, 16L, 2500L, 28000L)),
      s"got ${rows.toSeq}")
  }
}
