package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The 100x rehearsal tier (round-13 verdict ask #2): FlipProfile
  * proved base→10x linearity for the documented AQE flips; the 100 TB
  * claim deserves one more decade. This runs the FLIP SET —
  * q106_setsim_prefix, q171_containment_join, q159_embed_covariance —
  * plus one streaming drain (q328_stream_outer_join) against a
  * 100x-derived corpus ([[ScaleRehearsal.buildCorpusSuffix]]: token-
  * suffix copies, collision-proof beyond the 36-state rotation), with
  *
  *   - the same TYPED post-AQE shape verdict as the 10x rehearsal
  *     ([[ScaleRehearsal.shapeVerdict]], [[PlanShape.executedCounts]])
  *     — no new flips beyond the documented allowlist;
  *   - candidate/pair component counts for q106/q171 (FlipProfile's
  *     decomposition) so candidate growth is measured, not inferred
  *     from walls;
  *   - streaming state telemetry (final + PEAK rows, bytes) for the
  *     q328 drain at 100x the key universe.
  *
  * Timing is ONE cold rep per scale (the corpus build plus a 100x
  * drain make 3-rep medians a multi-hour run; at this tier the
  * verdict is SHAPE + COUNTS — ratios are reported for trend, and
  * in-round optimization claims still come from DebugBench colds).
  *
  * Usage: sbt "runMain graft.ScaleHundred [baseDir] [scratchDir] [copies]"
  * (defaults /root/testdata/sf0.1, /tmp/graft_scale100x, 100).
  * Results trend in dev/PERF_LEDGER.md (round-13 section).
  */
object ScaleHundred {

  val FlipSet: Seq[String] = Seq(
    "q106_setsim_prefix",
    "q171_containment_join",
    "q159_embed_covariance")

  def main(args: Array[String]): Unit = {
    val baseDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = if (args.length > 1) args(1) else "/tmp/graft_scale100x"
    val copies = if (args.length > 2) args(2).toInt else 100
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    ScaleRehearsal.buildCorpusSuffix(spark, baseDir, outDir, copies)

    def hygiene(): Unit = {
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def measure(name: String, dir: String): Double = {
      hygiene()
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def finalShape(name: String, dir: String): Map[String, Int] =
      PlanShape.executedCounts(SparkEntry.queries(name)(spark, dir))
    spark.read.parquet(s"$baseDir/region.parquet").count() // JVM warm-up

    // --- candidate/pair component counts (FlipProfile's decomposition,
    // one decade up): exactly-linear candidate growth is the claim.
    import graft.operators.SetSimJoin
    def counts(dir: String): (Long, Long, Long, Long) = {
      hygiene()
      val sig = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.expr.ShingleExpression.shingleHashes(col("text"), 3).as("sh"))
        .filter(size(col("sh")) >= 1)
      val withPre = SetSimJoin.prefixIndexed(sig, "doc_id", "sh", 0.5)
      val cand = SetSimJoin.prefixCandidates(withPre, 0.5).localCheckpoint(true)
      val nCand = cand.count()
      val nVer = SetSimJoin.verifyCandidates(withPre, cand, 0.5).count()
      hygiene()
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"),
          graft.functions.TextFunctions.tokens(col("text")).as("toks"))
      val idx = SetSimJoin.containmentIndex(docs, "doc_id", "toks",
        shingleSize = 3, maxDf = 50L)
      val nIdx = idx.count()
      val nCont = SetSimJoin.containmentJoinFromIndex(idx, minContainment = 0.7).count()
      (nCand, nVer, nIdx, nCont)
    }
    val (bCand, bVer, bIdx, bCont) = counts(baseDir)
    val (xCand, xVer, xIdx, xCont) = counts(outDir)
    println(f"${"component"}%-20s ${"base"}%12s ${s"x$copies"}%12s ${"ratio"}%8s")
    Seq(("q106.candidates", bCand, xCand), ("q106.verified", bVer, xVer),
      ("q171.index_rows", bIdx, xIdx), ("q171.contain_pairs", bCont, xCont))
      .foreach { case (n, b, x) =>
        val r = if (b > 0) f"${x.toDouble / b}%8.2f" else "     n/a"
        println(f"$n%-20s $b%12d $x%12d $r")
      }

    // --- flip set: wall + typed post-AQE shape at both scales ---
    println(f"${"query"}%-26s ${"base_s"}%8s ${s"x${copies}_s"}%8s ${"ratio"}%7s  shape")
    val rows = FlipSet.map { name =>
      val b = measure(name, baseDir)
      val shB = finalShape(name, baseDir)
      val x = measure(name, outDir)
      val shX = finalShape(name, outDir)
      val verdict = ScaleRehearsal.shapeVerdict(name, shB, shX)
      println(f"$name%-26s $b%8.2f $x%8.2f ${x / b}%7.2f  " +
        verdict.getOrElse(if (shB == shX) "same" else "documented-flip"))
      (name, b, x, verdict)
    }

    // --- streaming drain at 100x the key universe ---
    val sRows = Seq("q328_stream_outer_join" -> "soj").map { case (name, tag) =>
      val b = measure(name, baseDir)
      val infoB = PlanShape.lastStreamRun(tag)
        .getOrElse(sys.error(s"$name recorded no stream telemetry under '$tag'"))
      val x = measure(name, outDir)
      val infoX = PlanShape.lastStreamRun(tag)
        .getOrElse(sys.error(s"$name recorded no stream telemetry under '$tag'"))
      val verdict =
        if (infoB.shape == infoX.shape) None
        else Some(s"micro-batch plan diverged: base=${infoB.shape} x$copies=${infoX.shape}")
      println(f"$name%-26s $b%8.2f $x%8.2f ${x / b}%7.2f  " +
        f"final ${infoB.stateRows}->${infoX.stateRows} peak ${infoB.statePeakRows}->${infoX.statePeakRows} " +
        f"mem ${infoX.stateBytes / 1048576.0}%.1fMiB  ${verdict.getOrElse("same")}")
      (name, b, x, verdict)
    }

    val bad = (rows ++ sRows).filter(_._4.isDefined)
    println(s"""{"metric":"scale${copies}x","queries":${rows.size + sRows.size},"shape_regressions":${bad.size}}""")
    require(bad.isEmpty, s"plan shape REGRESSED at ${copies}x: " +
      bad.map(r => s"${r._1} (${r._4.get})").mkString("; "))
    spark.stop()
  }
}
