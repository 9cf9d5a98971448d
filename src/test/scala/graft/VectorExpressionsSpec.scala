package graft

import org.apache.spark.sql.functions._

import graft.expr.VectorExpressions.dot

/** The custom codegen DotProduct expression: value correctness vs the
  * interpreted HOF form, null/length semantics, analysis-time typing.
  */
class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot = (a: String, b: String) =>
    aggregate(zip_with(col(a), col(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  test("matches the interpreted aggregate/zip_with form on real embeddings") {
    val emb = spark.read.parquet(s"${sf("sf0.001")}/embeddings.parquet")
      .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("v"))
    val pairs = emb.limit(50).crossJoin(
      emb.limit(50).select(col("v").as("w")))
    val diff = pairs
      .select((dot(col("v"), col("w")) - hofDot("v", "w")).as("d"))
      .agg(max(abs(col("d")))).collect()(0).getDouble(0)
    assert(diff == 0.0)
  }

  test("null array propagates null; shorter array dots over common prefix") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0))),
      (Some(Seq(2.0, 10.0)), Some(Seq(3.0)))).toDF("a", "b")
    val out = df.select(dot(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
    assert(out(2).getDouble(0) == 6.0)
  }

  test("native MinHashSignature matches the composable HOF form exactly") {
    import graft.functions.TextFunctions
    val docs = spark.read.parquet(s"${sf("sf0.001")}/documents.parquet")
      .select(col("doc_id"), TextFunctions.wordShingles(
        TextFunctions.tokens(col("text")), 3).as("sh"))
    val both = docs.select(
      TextFunctions.minhashSignature(col("sh"), 32).as("native"),
      TextFunctions.minhashSignatureHof(col("sh"), 32).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() == 0)
    // empty-input sentinel
    val empty = Seq(Seq.empty[String]).toDF("sh")
      .select(TextFunctions.minhashSignature(col("sh"), 4)).collect()(0).getSeq[Long](0)
    assert(empty == Seq.fill(4)(2147483647L))
  }

  test("nearestCentroid: argmax dot, ties and NaN break toward the HIGHER cid") {
    import graft.expr.VectorExpressions.nearestCentroid
    val cids = Array(10L, 20L, 30L)
    val mat = Array(Array(1.0, 0.0), Array(0.0, 1.0), Array(0.0, 1.0))
    val rows = Seq(
      Seq(0.9, 0.1),            // nearest = (1,0) → 10
      Seq(0.1, 0.9),            // (0,1) twice, tie → higher cid 30
      Seq(Double.NaN, 1.0))     // NaN sims: Spark double order puts NaN
                                // greatest → all three NaN → cid 30
      .toDF("nv")
    val got = rows.select(nearestCentroid(col("nv"), cids, mat)).collect().map(_.getLong(0))
    assert(got.toSeq == Seq(10L, 30L, 30L))
    // interpreted eval agrees with codegen (the differential the
    // greatest-of-structs form it replaced got for free)
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    assert(graft.expr.NearestCentroidImpl.eval(
      new GenericArrayData(Array(0.1, 0.9)), cids, mat) == 30L)
  }

  test("non-double arrays are rejected at analysis time") {
    val df = Seq((Seq(1, 2), Seq(3, 4))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(dot(col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("graft_dot_product") ||
      e.getMessage.toLowerCase.contains("array<double>"))
  }
}
