package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** SURVEY §2.4 extension operators (E1–E24), each as a named query over
  * the driver test tables plus matching DuckDB oracle SQL.
  *
  * Determinism contract (SURVEY §5.2.1): every query ends in a
  * total-order `orderBy`; float-valued aggregates are rounded so that
  * Spark/DuckDB summation-order differences cannot leak into the hash
  * compare; column names are aliased identically on both sides.
  *
  * Scale notes are inline per query — broadcast hints on dimension
  * joins, partial aggregation shapes, TakeOrderedAndProject for top-k.
  */
object Queries {

  private def t(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") Tables.events(spark, dir)
    else spark.read.parquet(s"$dir/$name.parquet")

  /** E6: TPC-H Q1-shaped hash aggregation — partial+final agg, no join.
    * At 100 TB: map-side combine reduces the shuffle to
    * |groups|·|partitions| rows; grouping keys are low-cardinality.
    */
  def q01_agg_pricing(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        round(sum("l_quantity"), 2).as("sum_qty"),
        round(sum("l_extendedprice"), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(avg("l_quantity"), 4).as("avg_qty"),
        round(avg("l_discount"), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** E2: broadcast hash join through two tiny dims (region/nation are
    * KB-sized at any SF — always broadcast; no shuffle of customer).
    */
  def q02_join_broadcast(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "customer")
      .join(broadcast(t(s, dir, "nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir, "region")), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("cnt"), round(sum("c_acctbal"), 2).as("acctbal"))
      .orderBy("r_name")

  /** E3: large-side equi-join (orders⋈lineitem) — shuffle join on the
    * fact keys; AQE picks SMJ/SHJ. At 100 TB both sides co-partition on
    * orderkey; bucketing either table would remove the shuffle.
    */
  def q03_join_fact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .join(t(s, dir, "lineitem"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** E10: window ranking — top 3 orders per priority. Single shuffle on
    * the partition key; rank pushdown (WindowGroupLimit) keeps only 3
    * rows per key per partition before the sort at scale.
    */
  def q04_window_rank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy("o_orderpriority")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t(s, dir, "orders")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select("o_orderpriority", "o_orderkey", "o_totalprice", "rn")
      .orderBy("o_orderpriority", "rn")
  }

  /** E12: global top-k — plans as TakeOrderedAndProject (per-partition
    * heap + driver merge of k·p rows, never a full sort) at any scale.
    */
  def q05_topk_orders(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select("o_orderkey", "o_totalprice")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(10)

  /** E19: exact dedup on documents.text — expressed as keep-min-id per
    * text group (deterministic, unlike dropDuplicates' arbitrary row).
    * At 100 TB: pre-hash the text (`xxhash64`) so the shuffle key is 8
    * bytes, not the document body — see q19 variants in later rounds.
    */
  def q06_dedup_exact(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .groupBy("text")
      .agg(min("doc_id").as("doc_id"), count(lit(1)).as("dupes"))
      .select("doc_id", "dupes")
      .orderBy("doc_id")

  /** E21: tokenize + word count, top 20 — split/explode keeps the
    * explode inside one codegen stage; the agg shuffles only distinct
    * words (map-side combine).
    */
  def q07_text_wordcount(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "documents")
      .select(explode(split(lower(col("text")), "\\s+")).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("word").asc)
      .limit(20)

  /** E20: brute-force cosine top-k against the vec_id=0 query vector.
    * The probe vector broadcasts (single-row cross join); similarity is
    * pure codegen'd array math (`zip_with`+`aggregate`, no UDF); top-k
    * is TakeOrderedAndProject. At 100 TB this is the exact-scan
    * baseline; LSH/IVF variants land in later rounds.
    */
  def q08_cosine_topk(s: SparkSession, dir: String): DataFrame = {
    val emb = t(s, dir, "embeddings")
    val asDouble = (c: Column) => transform(c, x => x.cast("double"))
    val dot = (a: Column, b: Column) =>
      aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val probe = emb.filter(col("vec_id") === 0)
      .select(asDouble(col("embedding")).as("qv"))
    emb.filter(col("vec_id") =!= 0)
      .select(col("vec_id"), asDouble(col("embedding")).as("v"))
      .crossJoin(broadcast(probe))
      .select(
        col("vec_id"),
        round(
          dot(col("v"), col("qv")) /
            (sqrt(dot(col("v"), col("v"))) * sqrt(dot(col("qv"), col("qv")))),
          4).as("sim"))
      .orderBy(col("sim").desc, col("vec_id").asc)
      .limit(10)
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_agg_pricing"   -> (q01_agg_pricing _),
    "q02_join_broadcast" -> (q02_join_broadcast _),
    "q03_join_fact"     -> (q03_join_fact _),
    "q04_window_rank"   -> (q04_window_rank _),
    "q05_topk_orders"   -> (q05_topk_orders _),
    "q06_dedup_exact"   -> (q06_dedup_exact _),
    "q07_text_wordcount" -> (q07_text_wordcount _),
    "q08_cosine_topk"   -> (q08_cosine_topk _),
  )

  val oracle: Map[String, String] = Map(
    "q01_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity), 2) AS sum_qty,
        | round(sum(l_extendedprice), 2) AS sum_base_price,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        | round(avg(l_quantity), 4) AS avg_qty,
        | round(avg(l_discount), 4) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q02_join_broadcast" ->
      """SELECT r_name, count(*) AS cnt, round(sum(c_acctbal), 2) AS acctbal
        |FROM customer
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name ORDER BY r_name""".stripMargin,
    "q03_join_fact" ->
      """SELECT o_orderpriority,
        | round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        | count(*) AS n
        |FROM orders JOIN lineitem ON l_orderkey = o_orderkey
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
    "q04_window_rank" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_orderpriority
        |                       ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders)
        |WHERE rn <= 3 ORDER BY o_orderpriority, rn""".stripMargin,
    "q05_topk_orders" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,
    "q06_dedup_exact" ->
      """SELECT min(doc_id) AS doc_id, count(*) AS dupes
        |FROM documents GROUP BY text ORDER BY doc_id""".stripMargin,
    "q07_text_wordcount" ->
      """SELECT word, count(*) AS cnt FROM (
        |  SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
        |  FROM documents)
        |WHERE word <> '' GROUP BY word
        |ORDER BY cnt DESC, word ASC LIMIT 20""".stripMargin,
    "q08_cosine_topk" ->
      """WITH probe AS (
        |  SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
        |SELECT vec_id,
        |  round(list_dot_product(embedding::DOUBLE[], qv) /
        |        (sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) *
        |         sqrt(list_dot_product(qv, qv))), 4) AS sim
        |FROM embeddings, probe WHERE vec_id <> 0
        |ORDER BY sim DESC, vec_id ASC LIMIT 10""".stripMargin,
  )
}
