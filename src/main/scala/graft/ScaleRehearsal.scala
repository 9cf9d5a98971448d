package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** 10x scale rehearsal: converts the "survives 100x" plan arguments
  * into a MEASUREMENT. The driver's testdata is capped at sf0.1, so
  * this harness derives a ~10x corpus in scratch — a union of
  * ID-SHIFTED copies, deterministic, no new data source — and runs
  * the heaviest judged operators at both scales, reporting
  *
  *   1. the wall-time ratio (near-linear expected: these are scan/
  *      shuffle-bound plans with no quadratic term), and
  *   2. a PLAN-SHAPE assert: the same counts of shuffle exchanges and
  *      join strategies at both scales — a broadcast that flips to a
  *      shuffle, or a new exchange appearing only at 10x, is exactly
  *      the scale regression the 100 TB story cannot absorb.
  *
  * Corpus derivation per table (copy k = 0..9 of sf0.1):
  *   - lineitem: l_orderkey/l_partkey shifted by k·(max+1) — ten
  *     DISJOINT basket graphs (nodes x10, edges x10, triangles x10);
  *     same-key copies would multiply edge WEIGHT, not graph size.
  *   - events: user_id/event_id shifted — disjoint click→purchase
  *     attribution universes.
  *   - documents: doc_id shifted AND the text alphabet ROTATED by k
  *     (translate a..z -> rotation; word lengths, token counts, and
  *     within-copy structure preserved) so copies share ZERO shingles:
  *     identical text would make every doc a 10-way near-duplicate and
  *     blow the dedup pair count up QUADRATICALLY — a different
  *     workload, not a scale-up of this one. Rotation keeps each
  *     copy's planted near-dup structure intact, so pair output scales
  *     x10 like the corpus.
  *   - embeddings: vec_id shifted, vectors verbatim (covariance cost
  *     is row-linear; values repeating changes nothing it computes).
  *
  * Timing protocol: 3 cold reps per query per scale (Bench-identical
  * hygiene between reps), MIN kept — rep 1 carries the per-dir staged
  * builds (basket edges, adjacency, shingle signatures), which a real
  * deployment pays once per corpus snapshot, so the steady-state floor
  * is the honest scaling number; the staged-build time is reported
  * separately as rep1.
  *
  * Usage: sbt "runMain graft.ScaleRehearsal [baseDir] [scratchDir]"
  * (defaults /root/testdata/sf0.1 and /tmp/graft_scale10x). Results
  * trend in dev/PERF_LEDGER.md.
  */
object ScaleRehearsal {

  /** The bench's heaviest judged operators, one per cost family. */
  val Heavy: Seq[String] = Seq(
    "q212_local_clustering",    // triangle credits (staged adjacency)
    "q153_triangle_count",      // triangle census (staged adjacency)
    "q154_interval_attribution",// interval equi-join on user_id
    "q107_stem_topwords",       // regex-heavy token map + agg
    "q325_ngram_perplexity",    // bigram LM train + held-out score
    "q158_dedup_pipeline",      // full LSH dedup pipeline
    "q106_setsim_prefix",       // PPJoin prefix self-join (staged)
    "q171_containment_join",    // containment index join (staged)
    "q192_dsir_select",         // DSIR importance weights
    "q159_embed_covariance")    // d(d+1)/2 co-moment aggregation

  private val Copies = 10

  private def rotated(k: Int): String = {
    val a = "abcdefghijklmnopqrstuvwxyz"
    a.drop(k) + a.take(k)
  }

  /** Build the 10x tables if the scratch dir does not hold them yet. */
  def buildCorpus(s: SparkSession, baseDir: String, outDir: String): Unit = {
    val done = new java.io.File(s"$outDir/_BUILT")
    if (done.exists()) { System.err.println(s"[scale] reusing $outDir"); return }
    new java.io.File(outDir).mkdirs()
    def shifted(df: DataFrame, idCols: Seq[String],
        textRotate: Option[String] = None): DataFrame = {
      val shifts = idCols.map(c =>
        c -> (df.agg(max(col(c))).collect()(0).getLong(0) + 1L)).toMap
      (0 until Copies).map { k =>
        val withIds = idCols.foldLeft(df)((d, c) =>
          d.withColumn(c, col(c) + lit(k * shifts(c))))
        textRotate match {
          case Some(tc) => withIds.withColumn(tc,
            translate(col(tc), rotated(0), rotated(k)))
          case None => withIds
        }
      }.reduce(_ unionAll _)
    }
    val li = s.read.parquet(s"$baseDir/lineitem.parquet")
    shifted(li, Seq("l_orderkey", "l_partkey"))
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    val ev = sources.Tables.events(s, baseDir)
    shifted(ev, Seq("event_id", "user_id"))
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    val docs = s.read.parquet(s"$baseDir/documents.parquet")
    shifted(docs, Seq("doc_id"), textRotate = Some("text"))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    val emb = s.read.parquet(s"$baseDir/embeddings.parquet")
    shifted(emb, Seq("vec_id"))
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    // Warm-up table (DebugBench/Bench protocol reads it).
    s.read.parquet(s"$baseDir/region.parquet")
      .write.mode("overwrite").parquet(s"$outDir/region.parquet")
    done.createNewFile()
    System.err.println(s"[scale] built ${Copies}x corpus at $outDir")
  }

  /** Final-plan operator profile — the shape that must NOT change with
    * scale. Regex over the post-execution plan string (AQE final).
    */
  private def shape(df: DataFrame): Map[String, Int] = {
    val p = df.queryExecution.executedPlan.toString
    Seq("Exchange", "BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
      "BroadcastNestedLoopJoin", "CartesianProduct")
      .map(op => op -> op.r.findAllIn(p).size).toMap
  }

  /** Queries whose scaladoc DOCUMENTS that a planner-chosen broadcast
    * of a CORPUS-DERIVED side flips to a shuffle join at scale (the
    * design, not a regression — e.g. SetSimJoin's verify join: "AQE
    * broadcasts the checkpointed index when it is small; at scale it
    * is an equi-join on the pair ids"). For these, a BHJ→SMJ/SHJ flip
    * (and the exchanges/sorts the shuffle join adds) is accepted;
    * everything else must still match exactly.
    */
  private val DocumentedFlips: Set[String] =
    Set("q106_setsim_prefix", "q171_containment_join")

  /** Shape verdict: Some(reason) if the 10x plan regressed, None if
    * acceptable. Nested-loop/cartesian joins must stay at zero, the
    * total join count must match, and broadcast→shuffle flips are
    * allowed only for [[DocumentedFlips]] queries (with exchange
    * growth bounded by what the flipped joins themselves add).
    */
  private def shapeVerdict(name: String, base: Map[String, Int],
      x10: Map[String, Int]): Option[String] = {
    def joins(m: Map[String, Int]) =
      m("BroadcastHashJoin") + m("SortMergeJoin") + m("ShuffledHashJoin")
    // 1-row stats-frame crossJoins plan as BroadcastNestedLoopJoin at
    // EVERY scale (q145's audited pattern) — the regression signal is
    // a nested-loop/cartesian join that appears ONLY at 10x.
    if (base("CartesianProduct") != x10("CartesianProduct") ||
        base("BroadcastNestedLoopJoin") != x10("BroadcastNestedLoopJoin"))
      Some(s"nested-loop/cartesian count changed: base=$base x10=$x10")
    else if (joins(base) != joins(x10))
      Some(s"join count changed ${joins(base)} -> ${joins(x10)}")
    else {
      val flips = base("BroadcastHashJoin") - x10("BroadcastHashJoin")
      if (flips == 0 && base == x10) None
      else if (flips > 0 && DocumentedFlips(name) &&
          x10("Exchange") - base("Exchange") <= 2 * flips)
        None // documented corpus-derived-side flip
      else Some(s"plan diverged: base=$base x10=$x10")
    }
  }

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale10x"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    buildCorpus(spark, baseDir, outDir)

    def hygiene(): Unit = {
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    /** 3 cold reps; returns (min of reps 2-3, rep1) + final shape. */
    def measure(name: String, dir: String): (Double, Double, Map[String, Int]) = {
      var sh: Map[String, Int] = Map.empty
      val ts = (1 to 3).map { _ =>
        hygiene()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(name)(spark, dir)
        df.write.format("noop").mode("overwrite").save()
        sh = shape(df)
        (System.nanoTime() - t0) / 1e9
      }
      (ts.drop(1).min, ts.head, sh)
    }
    spark.read.parquet(s"$baseDir/region.parquet").count() // JVM warm-up

    println(f"${"query"}%-26s ${"base_s"}%7s ${"x10_s"}%7s ${"ratio"}%6s  ${"build1"}%7s  shape")
    val rows = Heavy.map { name =>
      val (b, _, shB) = measure(name, baseDir)
      val (x, x1, shX) = measure(name, outDir)
      val verdict = shapeVerdict(name, shB, shX)
      val flag = verdict.getOrElse(
        if (shB == shX) "same" else "documented-flip")
      println(f"$name%-26s $b%7.2f $x%7.2f ${x / b}%6.2f  $x1%7.2f  $flag")
      (name, b, x, verdict)
    }
    val bad = rows.filter(_._4.isDefined)
    println(f"""{"metric":"scale10x_ratio_median","value":${rows.map(r => r._3 / r._2).sorted.apply(rows.size / 2)}%.2f,"queries":${rows.size},"shape_regressions":${bad.size}}""")
    require(bad.isEmpty, s"plan shape REGRESSED at 10x: " +
      bad.map(r => s"${r._1} (${r._4.get})").mkString("; "))
    spark.stop()
  }
}
