package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.expr.PipelineConfig
import graft.pipeline.Pipeline
import graft.schema.SchemaProvider

/** Property suite (SURVEY §5.2.3): pipeline invariants that must hold
  * for ANY input shape — arbitrary JSON values in every field, missing
  * keys, extra keys, garbage rows.
  */
class PipelinePropertySpec extends SparkSpec {

  /** scalatestplus isn't on the classpath; drive ScalaCheck directly —
    * fixed seeds make every run reproducible.
    */
  private def forAllSeeded[A](gen: Gen[A], cases: Int = 8)(body: A => Unit): Unit =
    (1 to cases).foreach { i =>
      body(gen.pureApply(Gen.Parameters.default, Seed(i.toLong)))
    }
  import spark.implicits._

  private val provider = SchemaProvider.fromDescribeRows(Seq(
    "id"    -> "Int64",
    "score" -> "Float64",
    "name"  -> "String",
    "mode"  -> "Enum8('a'=1,'b'=2)",
    "at"    -> "DateTime"))
  private val metas = provider.resolveFiltered()
  private val cfg = PipelineConfig(
    required = Seq("id"),
    datetimeCols = Set("at"),
    stringEnumCols = Set("mode"))

  private val jsonValue: Gen[String] = Gen.oneOf(
    Gen.choose(-1000000L, 1000000L).map(_.toString),
    Gen.choose(-1e6, 1e6).map(_.toString),
    Gen.alphaNumStr.map(s => "\"" + s.take(12) + "\""),
    Gen.const("null"),
    Gen.const("true"),
    Gen.const("\"2024-03-05 12:30:45\""),
    Gen.const("\"\""))

  private val fieldNames = List("id", "score", "name", "mode", "at", "extra_key")

  private val payloadGen: Gen[String] = for {
    present <- Gen.someOf(fieldNames)
    values <- Gen.listOfN(present.size, jsonValue)
  } yield present.zip(values).map { case (k, v) => s""""$k": $v""" }
    .mkString("{", ", ", "}")

  private val batchGen: Gen[List[String]] = Gen.listOfN(12, payloadGen)

  test("valid + dlq partition the parseable input; output schema is always the sink schema") {
    forAllSeeded(batchGen) { payloads =>
      val res = Pipeline.process(payloads.toDF(Pipeline.ValueCol), metas, cfg)
      val nValid = res.valid.count()
      val nDlq = res.dlq.count()
      val nNonEmpty = payloads.count(_.trim.nonEmpty)
      assert(nValid + nDlq == nNonEmpty)
      assert(res.valid.schema.fieldNames.toSeq == metas.map(_.name))
      // sink types are fixed regardless of input chaos
      assert(res.valid.schema("id").dataType.typeName == "long")
      assert(res.valid.schema("at").dataType.typeName == "timestamp")
      res.release()
    }
  }

  test("datetime and present string-enum columns are never null post-coercion") {
    forAllSeeded(batchGen) { payloads =>
      val res = Pipeline.process(payloads.toDF(Pipeline.ValueCol), metas, cfg)
      val rows = res.valid.collect()
      val schema = res.valid.schema
      val atIdx = schema.fieldIndex("at")
      rows.foreach(r => assert(!r.isNullAt(atIdx), s"null datetime in $r"))
      // mode: when batch-present it's a string and never null ("DEFAULT" fill)
      if (schema("mode").dataType.typeName == "string") {
        val mIdx = schema.fieldIndex("mode")
        rows.foreach(r => assert(!r.isNullAt(mIdx)))
      }
      res.release()
    }
  }

  test("pipeline is deterministic and permutation-equivariant") {
    forAllSeeded(batchGen) { payloads =>
      def run(ps: List[String]): Seq[String] = {
        val res = Pipeline.process(ps.toDF(Pipeline.ValueCol), metas, cfg)
        val out = res.valid.collect().map(_.toString).sorted.toSeq
        res.release()
        out
      }
      val a = run(payloads)
      val b = run(scala.util.Random.shuffle(payloads))
      assert(a == b)
    }
  }
}
