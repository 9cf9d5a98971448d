package graft

import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.NativeAsOfJoin

/** The custom physical operator (plans/AsOfJoinPlan.scala) pinned to
  * the composed union+window as-of join it replaces: same results on
  * the real events table, on adversarial tie/no-match constructions,
  * and at forced multi-partition layouts; plus plan-shape assertions
  * that the exec actually plans with its clustered+sorted contract.
  */
class NativePlanSpec extends SparkSpec {
  import spark.implicits._

  private def sides(dir: String) = {
    val ev = sources.Tables.events(spark, dir)
      .select(col("user_id"), unix_micros(col("ts")).as("us"),
        col("event_id"), col("event_type"))
    val l = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("us"), col("event_id"))
    val r = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("us"), col("event_id"))
    (l, r)
  }

  test("native as-of exec == composed union+window form on the events table") {
    val (l, r) = sides(sf("sf0.01"))
    val native = NativeAsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    val composed = AsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    assert(native.columns.toSeq == composed.columns.toSeq)
    val n = native.collect().map(_.toString).sorted
    val c = composed.collect().map(_.toString).sorted
    assert(n.length == c.length && n.sameElements(c),
      s"native vs composed diverged (${n.length} vs ${c.length} rows)")
  }

  test("native as-of exec handles ties, no-match, equal-ts and null-ts rows") {
    val l = Seq(
      (1L, 100L, 10L), // matches r at ts=100 (inclusive), tie → rid 3
      (1L, 50L, 11L),  // no right row at or before 50 → nulls
      (2L, 10L, 12L),  // key with no right rows at all
      (1L, 200L, 13L)) // latest right at 150
      .toDF("user_id", "us", "event_id")
    val lNull = Seq((1L, Option.empty[Long], 14L))
      .toDF("user_id", "us", "event_id")
    val r = Seq(
      (1L, 100L, 2L), (1L, 100L, 3L), // tie on ts: greatest id wins
      (1L, 150L, 4L),
      (3L, 5L, 5L))
      .toDF("user_id", "us", "event_id")
    val got = NativeAsOfJoin.backward(
      l.unionByName(lNull), r, "user_id", "us", "us", "event_id")
      .collect()
      .map(row => (row.getLong(2),
        if (row.isNullAt(4)) -1L else row.getLong(4))).toMap
    assert(got == Map(10L -> 3L, 11L -> -1L, 12L -> -1L, 13L -> 4L, 14L -> -1L))
    val composed = AsOfJoin.backward(
      l.unionByName(lNull), r, "user_id", "us", "us", "event_id")
      .collect()
      .map(row => (row.getLong(2),
        if (row.isNullAt(4)) -1L else row.getLong(4))).toMap
    assert(composed == got, "construction case diverged from composed form")
  }

  test("native as-of exec survives adversarial partitioning (keys split across input partitions)") {
    val l = spark.range(100000).select(
      (col("id") % 7).as("user_id"), (col("id") * 2 + 1).as("us"),
      col("id").as("event_id")).repartition(13)
    val r = spark.range(100000).select(
      (col("id") % 7).as("user_id"), (col("id") * 2).as("us"),
      col("id").as("event_id")).repartition(17)
    val native = NativeAsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    val composed = AsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    assert(native.count() == 100000)
    val diff = native.toDF("k", "t", "e", "rt", "re")
      .exceptAll(composed.toDF("k", "t", "e", "rt", "re")).count()
    assert(diff == 0, s"$diff rows diverged at forced partition layouts")
  }

  test("native FORWARD as-of == composed forward form on the events table") {
    val (l, r) = sides(sf("sf0.01"))
    val native = NativeAsOfJoin.forward(l, r, "user_id", "us", "us", "event_id")
    val composed = AsOfJoin.forward(l, r, "user_id", "us", "us", "event_id")
    assert(native.columns.toSeq == composed.columns.toSeq)
    val n = native.collect().map(_.toString).sorted
    val c = composed.collect().map(_.toString).sorted
    assert(n.length == c.length && n.sameElements(c),
      s"native vs composed forward diverged (${n.length} vs ${c.length} rows)")
  }

  test("native forward as-of handles ties, no-match, equal-ts and null-ts rows") {
    val l = Seq(
      (1L, 100L, 10L), // matches r at ts=100 (inclusive), tie → SMALLEST rid 2
      (1L, 160L, 11L), // no right row at or after 160 → nulls
      (2L, 10L, 12L),  // key with no right rows at all
      (1L, 120L, 13L)) // earliest right at 150
      .toDF("user_id", "us", "event_id")
    val lNull = Seq((1L, Option.empty[Long], 14L))
      .toDF("user_id", "us", "event_id")
    val r = Seq(
      (1L, 100L, 2L), (1L, 100L, 3L), // tie on ts: smallest id wins
      (1L, 150L, 4L),
      (3L, 500L, 5L))
      .toDF("user_id", "us", "event_id")
    val got = NativeAsOfJoin.forward(
      l.unionByName(lNull), r, "user_id", "us", "us", "event_id")
      .collect()
      .map(row => (row.getLong(2),
        if (row.isNullAt(4)) -1L else row.getLong(4))).toMap
    assert(got == Map(10L -> 2L, 11L -> -1L, 12L -> -1L, 13L -> 4L, 14L -> -1L))
    val composed = AsOfJoin.forward(
      l.unionByName(lNull), r, "user_id", "us", "us", "event_id")
      .collect()
      .map(row => (row.getLong(2),
        if (row.isNullAt(4)) -1L else row.getLong(4))).toMap
    assert(composed == got, "forward construction case diverged from composed form")
  }

  test("STRING-keyed native as-of == composed form on orders (generic-orderable binding)") {
    // The key comparisons run through the interpreted ordering instead
    // of the 64-bit fast path; both directions must agree with the
    // composed union+window form on a real string key.
    val o = spark.read.parquet(s"${sf("sf0.01")}/orders.parquet")
    val dayN = datediff(col("o_orderdate"), lit("1970-01-01")).cast("long")
    val l = o.filter(col("o_orderstatus") === "O")
      .select(col("o_orderpriority"), dayN.as("day_n"), col("o_orderkey"))
    val r = o.filter(col("o_orderstatus") === "F")
      .select(col("o_orderpriority"), dayN.as("day_n"), col("o_orderkey"))
    for (fwd <- Seq(false, true)) {
      val (nat, comp) =
        if (fwd) (NativeAsOfJoin.forward(l, r, "o_orderpriority", "day_n", "day_n", "o_orderkey"),
          AsOfJoin.forward(l, r, "o_orderpriority", "day_n", "day_n", "o_orderkey"))
        else (NativeAsOfJoin.backward(l, r, "o_orderpriority", "day_n", "day_n", "o_orderkey"),
          AsOfJoin.backward(l, r, "o_orderpriority", "day_n", "day_n", "o_orderkey"))
      val n = nat.collect().map(_.toString).sorted
      val c = comp.collect().map(_.toString).sorted
      assert(n.length == c.length && n.sameElements(c),
        s"string-keyed native (fwd=$fwd) diverged: ${n.length} vs ${c.length} rows")
    }
  }

  test("string-keyed native as-of: ties, no-match and cross-key cursor discipline") {
    val l = Seq(("b", 100L, 10L), ("a", 50L, 11L), ("c", 10L, 12L), ("b", 200L, 13L))
      .toDF("k", "ts", "lid")
    val r = Seq(("b", 100L, 2L), ("b", 100L, 3L), ("b", 150L, 4L), ("a", 5L, 5L))
      .toDF("k", "ts", "rid")
    val got = NativeAsOfJoin.backward(l, r, "k", "ts", "ts", "rid")
      .collect()
      .map(row => (row.getLong(2), if (row.isNullAt(4)) -1L else row.getLong(4))).toMap
    // b@100 → tie, greatest rid 3; a@50 → rid 5; c@10 → none; b@200 → rid 4
    assert(got == Map(10L -> 3L, 11L -> 5L, 12L -> -1L, 13L -> 4L))
  }

  test("bucketed inputs satisfy the FORWARD contract too: zero exchanges planned") {
    val (l, r) = sides(sf("sf0.001"))
    l.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "us", "event_id").saveAsTable("asof_l_fb")
    r.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "us", "event_id").saveAsTable("asof_r_fb")
    try {
      val native = NativeAsOfJoin.forward(
        spark.table("asof_l_fb"), spark.table("asof_r_fb"),
        "user_id", "us", "us", "event_id")
      val plan = native.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin "), s"expected the native exec:\n$plan")
      assert(!plan.contains("Exchange"),
        s"bucketed forward as-of join must plan shuffle-free:\n$plan")
      val composed = AsOfJoin.forward(l, r, "user_id", "us", "us", "event_id")
      assert(native.collect().map(_.toString).sorted
        .sameElements(composed.collect().map(_.toString).sorted))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l_fb")
      spark.sql("DROP TABLE IF EXISTS asof_r_fb")
    }
  }

  test("PushFilterThroughAsOf: left-only filters sink below the join, right-side filters stay") {
    val (l, r) = sides(sf("sf0.001"))
    val joined = NativeAsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    val filtered = joined.filter(col("user_id") < 5 && col("r_event_id").isNotNull)
    val opt = filtered.queryExecution.optimizedPlan
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter}
    val node = opt.collectFirst { case j: graft.plans.AsOfJoinNode => j }.get
    // The left-only conjunct must now live UNDER the join…
    assert(node.left.collectFirst { case f: LFilter => f }.isDefined,
      s"left filter not pushed:\n$opt")
    // …while the right-payload conjunct (null-extension semantics)
    // must NOT reach the right child.
    assert(node.right.collectFirst {
      case f: LFilter if f.condition.references.exists(_.name == "event_id") => f
    }.isEmpty, s"right-side filter wrongly pushed:\n$opt")
    // And the rewrite preserves results vs the composed form.
    val composed = AsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
      .filter(col("user_id") < 5 && col("r_event_id").isNotNull)
    assert(filtered.collect().map(_.toString).sorted
      .sameElements(composed.collect().map(_.toString).sorted))
  }

  test("PruneAsOfColumns: unused right payload never enters the exchange") {
    val (l, r0) = sides(sf("sf0.001"))
    val r = r0.withColumn("payload", lit("x" * 10)) // droppable ballast
    val slim = NativeAsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
      .select(col("event_id"), col("r_us"))
    val node = slim.queryExecution.optimizedPlan
      .collectFirst { case j: graft.plans.AsOfJoinNode => j }.get
    assert(!node.right.output.exists(_.name == "payload"),
      s"payload column survived pruning: ${node.right.output}")
    assert(node.right.output.map(_.name).toSet == Set("user_id", "us", "event_id"))
  }

  test("bucketed inputs satisfy the distribution contract: ZERO exchanges planned") {
    val (l, r) = sides(sf("sf0.001"))
    l.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "us", "event_id").saveAsTable("asof_l_b")
    r.write.mode("overwrite").bucketBy(4, "user_id")
      .sortBy("user_id", "us", "event_id").saveAsTable("asof_r_b")
    try {
      val native = NativeAsOfJoin.backward(
        spark.table("asof_l_b"), spark.table("asof_r_b"),
        "user_id", "us", "us", "event_id")
      val plan = native.queryExecution.executedPlan.toString
      assert(plan.contains("AsOfJoin "), s"expected the native exec:\n$plan")
      // The whole point of expressing the requirement as a
      // Distribution: bucket layout satisfies it, so the planner
      // inserts NO shuffle on either side (the composed union+window
      // form always re-shuffles the union).
      assert(!plan.contains("Exchange"),
        s"bucketed as-of join must plan shuffle-free:\n$plan")
      val composed = AsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
      assert(native.collect().map(_.toString).sorted
        .sameElements(composed.collect().map(_.toString).sorted))
    } finally {
      spark.sql("DROP TABLE IF EXISTS asof_l_b")
      spark.sql("DROP TABLE IF EXISTS asof_r_b")
    }
  }

  test("the exec plans with its clustered distribution + (key, ts) sort contract") {
    val (l, r) = sides(sf("sf0.001"))
    val native = NativeAsOfJoin.backward(l, r, "user_id", "us", "us", "event_id")
    val plan = native.queryExecution.executedPlan.toString
    // The exec prints with the Exec suffix stripped (TreeNode.nodeName).
    assert(plan.contains("AsOfJoin "), s"expected the native exec:\n$plan")
    assert(plan.contains("Sort ["), s"expected planner-inserted sorts:\n$plan")
    assert(plan.contains("hashpartitioning(user_id"),
      s"expected key-clustered exchanges:\n$plan")
    assert(!plan.contains("Window"), s"native path must not window:\n$plan")
  }

  test("q315 nearest join: BOTH directions run the native exec; no window, no SMJ on the event side") {
    val df = Queries.all("q315_nearest_event_join")(spark, sf("sf0.001"))
    val plan = df.queryExecution.executedPlan.toString
    val nAsOf = "AsOfJoin ".r.findAllIn(plan).length
    assert(nAsOf == 2, s"expected two native as-of execs (backward + forward), found $nAsOf:\n$plan")
    assert(!plan.contains("Window"), s"nearest join must not fall back to the window form:\n$plan")
    assert(!plan.contains("SortMergeJoin"), s"no generic join may appear:\n$plan")
  }
}
