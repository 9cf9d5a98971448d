package graft.operators

import org.apache.spark.sql.{DataFrame, functions => F}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Byte-pair-encoding merge learning, distributed.
  *
  * Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY
  * table, not the raw corpus: the corpus is tokenized once into
  * (word, count) — vocabulary-sized, orders of magnitude smaller than
  * the corpus — and every merge round runs over that table only. That
  * is exactly the shape that scales: at 100 TB the corpus scan happens
  * ONCE (the word count), and the k merge rounds iterate over a
  * few-million-row frame that fits in cluster memory.
  *
  * Each round:
  *   1. explode adjacent symbol pairs, weight by word count, aggregate
  *      -> pair frequencies (map-side partial agg, |pairs| small);
  *   2. take the argmax pair (ties broken by (left, right) ascending —
  *      deterministic) — a 1-row driver fetch, same bounded pattern as
  *      the Lloyd rounds in AnnIvf;
  *   3. rewrite each word's symbol array with a greedy LEFT-TO-RIGHT
  *      fold merging adjacent (left, right) -> left+right. The fold is
  *      a codegen'd `aggregate` HOF — "aaa" with pair (a,a) becomes
  *      ["aa","a"], matching the reference greedy semantics.
  *
  * The symbol frame is re-persisted per round and the previous round's
  * cache released, so lineage stays one-round deep (the Components.scala
  * iteration discipline).
  */
object Bpe {

  /** One learned merge: step (1-based), the pair, and its weighted
    * frequency at the time it was chosen.
    */
  final case class Merge(step: Int, left: String, right: String, freq: Long)

  /** Learn `k` merges from a (word, n) frequency frame.
    * `words` must have a string column `word` and long column `n`.
    */
  def learnMerges(words: DataFrame, k: Int): Seq[Merge] = {
    // Initial symbolization: one char per symbol.
    var syms = words.select(
      col("n"),
      transform(sequence(lit(1), length(col("word"))),
        i => substring(col("word"), i, lit(1)).cast("string")).as("syms"))
      .filter(size(col("syms")) >= 2)
      .persist(StorageLevel.MEMORY_AND_DISK)

    // One Spark job per round: the argmax action BOTH answers the round
    // and materializes the current round's persist (an explicit count()
    // per round doubled the driver-round latency — the dominant cost of
    // a k-round loop over a vocabulary-sized frame). The previous
    // round's cache is released only AFTER the argmax has run, so the
    // new frame never recomputes through an unpersisted parent.
    var prev: Option[DataFrame] = None
    val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    while (step <= k) {
      val best = syms
        .select(col("n"), explode(transform(sequence(lit(1), size(col("syms")) - 1),
          i => struct(element_at(col("syms"), i).as("l"),
            element_at(col("syms"), i + 1).as("r")))).as("p"))
        .groupBy(col("p.l"), col("p.r"))
        .agg(sum("n").as("freq"))
        .orderBy(desc("freq"), col("l"), col("r"))
        .limit(1)
        .collect()
      prev.foreach(_.unpersist(blocking = false))
      prev = None
      if (best.isEmpty) {
        step = k + 1 // no pairs left anywhere
      } else {
        val row = best(0)
        val l = row.getString(0)
        val r = row.getString(1)
        val f = row.getLong(2)
        merges += Merge(step, l, r, f)
        // Greedy left-to-right merge of (l, r) in every word.
        val next = syms.select(col("n"),
          aggregate(col("syms"), array().cast("array<string>"),
            (acc, x) => when(size(acc) > 0 &&
                element_at(acc, -1) === lit(l) && x === lit(r),
              concat(slice(acc, lit(1), size(acc) - 1), array(lit(l + r))))
              .otherwise(concat(acc, array(x)))).as("syms"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        prev = Some(syms)
        syms = next
        step += 1
      }
    }
    syms.unpersist(blocking = false)
    prev.foreach(_.unpersist(blocking = false))
    merges.toSeq
  }

  /** ENCODE: apply an ordered merge list to a (word, n) frame. Each
    * word's character symbolization is rewritten by every merge IN
    * LEARNED ORDER with the same greedy left-to-right fold used during
    * training, so for any word seen in training, encode reproduces the
    * training loop's final symbol state exactly (BpeSpec pins this).
    *
    * Shape: the k merges chain into k `aggregate` HOFs over a
    * bounded-length symbol array — ONE narrow codegen'd map over the
    * vocabulary, no shuffle, no UDF, nothing driver-side. At 100 TB
    * the tokenizer-application pass over the raw corpus is exactly
    * this expression applied per word (or per pre-split word table,
    * as here, which is vocabulary-sized).
    *
    * Returns (word, n, syms: array<string>).
    */
  def encode(words: DataFrame, merges: Seq[Merge]): DataFrame = {
    val chars = transform(sequence(lit(1), length(col("word"))),
      i => substring(col("word"), i, lit(1)).cast("string"))
    val encoded = merges.foldLeft(chars) { (syms, m) =>
      aggregate(syms, array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(m.left) && x === lit(m.right),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(m.left + m.right))))
          .otherwise(concat(acc, array(x))))
    }
    words.select(col("word"), col("n"), encoded.as("syms"))
  }

  /** Driver-local reference encoder (differential tests). */
  def encodeLocal(word: String, merges: Seq[Merge]): Vector[String] = {
    var s = word.map(_.toString).toVector
    for (m <- merges) {
      val acc = scala.collection.mutable.ArrayBuffer.empty[String]
      for (x <- s) {
        if (acc.nonEmpty && acc.last == m.left && x == m.right)
          acc(acc.length - 1) = m.left + m.right
        else acc += x
      }
      s = acc.toVector
    }
    s
  }

  /** Reference (driver-local) implementation for differential testing:
    * identical greedy left-to-right semantics over an in-memory
    * (word, count) map.
    */
  def learnMergesLocal(words: Map[String, Long], k: Int): Seq[Merge] = {
    var tbl: Map[Vector[String], Long] = words.collect {
      case (w, n) if w.length >= 2 => (w.map(_.toString).toVector, n)
    }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((s, n) <- tbl; i <- 0 until s.length - 1)
        counts((s(i), s(i + 1))) = counts.getOrElse((s(i), s(i + 1)), 0L) + n
      if (counts.isEmpty) done = true
      else {
        val ((l, r), f) = counts.minBy { case ((a, b), c) => (-c, a, b) }
        out += Merge(step, l, r, f)
        tbl = tbl.toSeq.map { case (s, n) =>
          val acc = scala.collection.mutable.ArrayBuffer.empty[String]
          for (x <- s) {
            if (acc.nonEmpty && acc.last == l && x == r) acc(acc.length - 1) = l + r
            else acc += x
          }
          (acc.toVector, n)
        }.groupBy(_._1).map { case (s, g) => (s, g.map(_._2).sum) }
        step += 1
      }
    }
    out.toSeq
  }
}
