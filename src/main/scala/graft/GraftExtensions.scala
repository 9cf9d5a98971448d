package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.expr.{DotProduct, JaroWinkler, MinHashSignature}

/** SparkSessionExtensions injector: registers graft's native
  * expressions as SQL functions, so they're usable from `spark.sql`
  * and `selectExpr` (and by any SQL-speaking client of a session built
  * with `.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.GraftExtensions`):
  *
  *   - `graft_dot_product(array<double>, array<double>) -> double`
  *   - `graft_minhash(array<string>, numHashes) -> array<bigint>`
  *   - `graft_jaro_winkler(string, string) -> double`
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // Physical planning + optimizer rules for graft's native logical
    // operators (plans/AsOfJoinPlan.scala, plans/AsOfJoinRules.scala).
    ext.injectPlannerStrategy(_ => graft.plans.AsOfJoinStrategy)
    graft.plans.AsOfJoinRules.all.foreach(r => ext.injectOptimizerRule(_ => r))
  }
}

object GraftExtensions {

  type FunctionDescription =
    (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)

  val functions: Seq[FunctionDescription] = Seq(
    (
      new FunctionIdentifier("graft_dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot_product"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_dot_product takes (array<double>, array<double>)")
        DotProduct(children(0), children(1))
      }),
    (
      new FunctionIdentifier("graft_minhash"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "graft_minhash"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_minhash takes (array<string>, numHashes)")
        val n = children(1) match {
          case Literal(v: Int, _) => v
          case other => throw new IllegalArgumentException(
            s"graft_minhash numHashes must be an integer literal, got $other")
        }
        MinHashSignature(children(0), n)
      }),
    (
      new FunctionIdentifier("graft_jaro_winkler"),
      new ExpressionInfo(classOf[JaroWinkler].getName, "graft_jaro_winkler"),
      (children: Seq[Expression]) => {
        require(children.length == 2,
          "graft_jaro_winkler takes (string, string)")
        JaroWinkler(children(0), children(1))
      }))

  /** Register on an already-built session (tests, shells). Sessions
    * built with `spark.sql.extensions=graft.GraftExtensions` get this
    * automatically.
    */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, info, builder) =>
      spark.sessionState.functionRegistry.registerFunction(id, info, builder)
    }
}
