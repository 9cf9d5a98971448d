package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Component profile of the two DOCUMENTED 10x broadcast→shuffle
  * flips — q106 (PPJoin prefix self-join) and q171 (containment
  * index join), ScaleRehearsal's worst wall ratios (2.74x / 2.13x at
  * 10x in round 11). The rehearsal times whole queries; this breaks
  * each into its cost components at BOTH scales so the super-linear
  * share is attributable:
  *
  *   q106: (1) signature-table build (tokenize+shingle+hash+write —
  *         the staged once-per-corpus cost), (2) prefix index
  *         checkpoint, (3) candidate join (the stage whose fan-out
  *         the prefix/length/positional filters bound), (4) verify
  *         join (the stage that FLIPS: broadcast of the checkpointed
  *         index at sf0.1, pair-id equi-join at scale).
  *   q171: (1) df-capped inverted-index build+write (staged),
  *         (2) index self-join + containment rollup (the flipping
  *         consumer).
  *
  * Candidate/pair COUNTS are printed next to the times: if candidates
  * scale ~linearly (x10) while a stage's wall scales worse, the
  * excess is the flipped join's sort/shuffle machinery (n log n) and
  * the df-cap is NOT the lever; if candidates scale super-linearly,
  * the cap is. (For the rotated rehearsal corpus the expectation is
  * linear: copies share zero shingles, so per-shingle df — and with
  * it Σ min(df, cap)² — scales with copy count, not quadratically.)
  *
  * Usage: sbt "runMain graft.FlipProfile [baseDir] [scratchDir]"
  * (defaults match ScaleRehearsal; reuses its derived corpus).
  * Results trend in dev/PERF_LEDGER.md.
  */
object FlipProfile {

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
    ScaleRehearsal.buildCorpus(spark, baseDir, outDir)
    spark.read.parquet(s"$baseDir/region.parquet").count() // JVM warm-up

    def hygiene(): Unit = {
      CacheRegistry.releaseAll()
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def timed[T](body: => T): (Double, T) = {
      val t0 = System.nanoTime()
      val r = body
      ((System.nanoTime() - t0) / 1e9, r)
    }

    case class Comp(name: String, secs: Double, rows: Long)

    def profile(dir: String): Seq[Comp] = {
      import graft.operators.SetSimJoin
      val scratch = java.nio.file.Files
        .createTempDirectory("flip_prof_").toString
      hygiene()
      // --- q106 components ---
      val (tSig, _) = timed {
        spark.read.parquet(s"$dir/documents.parquet")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            graft.expr.ShingleExpression.shingleHashes(col("text"), 3).as("sh"))
          .filter(size(col("sh")) >= 1)
          .write.mode("overwrite").parquet(s"$scratch/sig")
      }
      val sig = spark.read.parquet(s"$scratch/sig")
      val nDocs = sig.count()
      val (tPre, withPre) = timed {
        SetSimJoin.prefixIndexed(sig, "doc_id", "sh", 0.5)
      }
      // NOTE: the candidates checkpoint exists only to time stages 3
      // and 4 separately; the fused q106 pipeline never materializes
      // this frame, so stage-4 attribution here runs the verify join
      // over a checkpointed input rather than the fused plan. Stage
      // RATIOS across scales remain comparable (both scales pay the
      // same materialization); absolute stage-4 walls are not the
      // production number — q106's own bench time is.
      val (tCand, candAndN) = timed {
        val c = SetSimJoin.prefixCandidates(withPre, 0.5)
          .localCheckpoint(true)
        (c, c.count())
      }
      val (cand, nCand) = candAndN
      val (tVer, nPairs) = timed {
        SetSimJoin.verifyCandidates(withPre, cand, 0.5).count()
      }
      // --- q171 components ---
      hygiene()
      val (tIdx, _) = timed {
        val docs = spark.read.parquet(s"$dir/documents.parquet")
          .repartition(spark.sparkContext.defaultParallelism)
          .select(col("doc_id"),
            graft.functions.TextFunctions.tokens(col("text")).as("toks"))
        SetSimJoin.containmentIndex(docs, "doc_id", "toks",
            shingleSize = 3, maxDf = 50L)
          .write.mode("overwrite").parquet(s"$scratch/cidx")
      }
      val idx = spark.read.parquet(s"$scratch/cidx")
      val nIdx = idx.count()
      val (tCont, nCont) = timed {
        SetSimJoin.containmentJoinFromIndex(idx, minContainment = 0.7).count()
      }
      hygiene()
      Seq(
        Comp("q106.sig_build", tSig, nDocs),
        Comp("q106.prefix_ckpt", tPre, nDocs),
        Comp("q106.cand_join", tCand, nCand),
        Comp("q106.verify_join", tVer, nPairs),
        Comp("q171.index_build", tIdx, nIdx),
        Comp("q171.contain_join", tCont, nCont))
    }

    profile(baseDir) // discarded: pays whole-pipeline codegen warm-up
    val base = profile(baseDir)
    val x10 = profile(outDir)
    println(f"${"component"}%-20s ${"base_s"}%7s ${"x10_s"}%7s ${"t_ratio"}%7s ${"base_rows"}%10s ${"x10_rows"}%11s ${"r_ratio"}%7s")
    base.zip(x10).foreach { case (b, x) =>
      // Zero-guard: a stage yielding 0 rows (or sub-ms wall) at base
      // scale has no meaningful ratio — print "n/a" instead of
      // NaN/Infinity.
      def ratio(num: Double, den: Double): String =
        if (den > 0) f"${num / den}%7.2f" else "    n/a"
      println(f"${b.name}%-20s ${b.secs}%7.2f ${x.secs}%7.2f ${ratio(x.secs, b.secs)} " +
        f"${b.rows}%10d ${x.rows}%11d ${ratio(x.rows.toDouble, b.rows.toDouble)}")
    }
    spark.stop()
  }
}
