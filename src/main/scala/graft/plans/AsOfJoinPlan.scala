package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.graft.bridge

/** Native backward as-of join as a first-class operator — the deepest
  * rung of SURVEY §7.4's extension ladder (custom `LogicalPlan` +
  * `Strategy` + physical `SparkPlan`, injected through
  * `SparkSessionExtensions`), complementing the composed union+window
  * form in `operators/AsOfJoin.scala`.
  *
  * Why a physical operator at all: the union+window form materializes
  * a tagged union of both sides and runs `last(ignoreNulls)` over it —
  * two wide projections and a window buffer per key. This exec instead
  * asks the planner for exactly what the algorithm needs — both sides
  * hash-CLUSTERED on the key and sorted by (key, ts[, tie]) — and then
  * streams the two sorted partitions through a single forward-only
  * merge: O(1) state (the last eligible right row), zero buffering,
  * no union, no window. EnsureRequirements inserts the shuffles/sorts
  * only when the children aren't already partitioned that way — on a
  * bucketed table the join runs with NO exchange at all, which the
  * composed form can never express.
  *
  * Semantics (pinned by the differential suite to
  * AsOfJoin.backward/forward): for each left row the single latest
  * right row of the same key with `r.ts <= l.ts` (backward,
  * inclusive; ties on ts resolve to the GREATEST tie column) or the
  * single earliest right row with `r.ts >= l.ts` (forward, inclusive;
  * ties to the SMALLEST tie column); unmatched left rows null-extend.
  * Null left ts or key matches nothing; null right ts/key rows are
  * ignored. Event times and the tie column are 64-bit integers
  * (project timestamps to `unix_micros` first — exact), the common
  * shape for event streams; the KEY is any orderable type — key
  * comparisons run through the type's interpreted ordering (the
  * promised binding change), so string/decimal/date keys use the
  * identical merge (q151 runs a string-keyed join against a LATERAL
  * oracle; NativePlanSpec differentials cover it).
  *
  * Both directions run the SAME physical contract — clustered on key,
  * sorted (key, ts[, tie]) ascending on both sides — and one forward
  * scan: backward holds the last eligible right row behind the
  * cursor; forward's match IS the cursor after skipping dead rows
  * (`r.ts < l.ts` rows can never match this or any later left row of
  * the key, since left ts only grows). Either way O(1) state.
  */
case class AsOfJoinNode(
    left: LogicalPlan,
    right: LogicalPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression,
    forward: Boolean = false) extends BinaryNode {
  // Right payload null-extends on unmatched left rows.
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, tie, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lt, rk, rt, tie, fwd) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKey: Expression,
    leftTs: Expression,
    rightKey: Expression,
    rightTs: Expression,
    rightTie: Expression,
    forward: Boolean = false) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // The planner contract that makes the merge correct AND cheap:
  // both sides clustered on the key (co-partitioned by
  // EnsureRequirements, or satisfied for free by bucketed children)…
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) ::
      ClusteredDistribution(Seq(rightKey)) :: Nil

  // …and sorted by (key, ts[, tie]) inside each partition, so one
  // forward pass suffices and the greatest-tie row is the last seen.
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  // Left rows stream through in their sorted order.
  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def doExecute(): RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey, left.output)
    val lTsB = BindReferences.bindReference(leftTs, left.output)
    val rKeyB = BindReferences.bindReference(rightKey, right.output)
    val rTsB = BindReferences.bindReference(rightTs, right.output)
    val rightSchema = right.schema
    val out = output
    // The promised "binding change, not an algorithm change": key
    // comparisons go through the type's interpreted ordering, so ANY
    // orderable key type (string, decimal, date, struct) runs the same
    // merge. Event time / tie stay primitive 64-bit. The eval() boundary
    // boxes either way, so the Long fast path this generalizes from
    // paid the same allocation; the ordering adds one virtual call per
    // comparison — unmeasurable next to the row copy (ledger: q147).
    val keyOrd = org.apache.spark.sql.catalyst.util.TypeUtils
      .getInterpretedOrdering(leftKey.dataType)

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joiner = new JoinedRow
      val nullRight = new GenericInternalRow(rightSchema.length)
      val project = UnsafeProjection.create(out, out)

      // One-row lookahead over the right side; rows with null key/ts
      // can never match and are skipped at the source. The key is held
      // as a COPY-safe value: primitive/UTF8String evals from a reused
      // row buffer must not be retained across advance() — UTF8String
      // clones below.
      var cur: InternalRow = null
      var curKey: Any = null
      var curTs = 0L
      def copyKey(k: Any): Any = k match {
        case s: org.apache.spark.unsafe.types.UTF8String => s.clone()
        case other => other
      }
      def advance(): Unit = {
        cur = null
        while (cur == null && rIter.hasNext) {
          val r = rIter.next()
          val k = rKeyB.eval(r)
          val t = rTsB.eval(r)
          if (k != null && t != null) {
            curKey = copyKey(k)
            curTs = t.asInstanceOf[Long]
            cur = r
          }
        }
      }
      advance()

      if (forward) {
        // Forward: after skipping dead rows (keys below lk, or this
        // key's rows strictly before lt — useless to every later left
        // row too, since left (key, ts) only grows), the cursor ITSELF
        // is the match: the first remaining row of key lk has the
        // smallest (ts, tie) with ts >= lt, thanks to the ascending
        // order. No held state, no copy — the cursor only moves on a
        // later left row's skip loop.
        lIter.map { l =>
          val lkRef = lKeyB.eval(l)
          val ltRef = lTsB.eval(l)
          if (lkRef == null || ltRef == null) {
            // Null key/event time matches nothing; the cursor must NOT
            // advance past rows later left rows still need.
            project(joiner(l, nullRight))
          } else {
            val lk = lkRef
            val lt = ltRef.asInstanceOf[Long]
            var cmp = if (cur == null) 1 else keyOrd.compare(curKey, lk)
            while (cur != null && (cmp < 0 || (cmp == 0 && curTs < lt))) {
              advance()
              if (cur != null) cmp = keyOrd.compare(curKey, lk)
            }
            project(joiner(l,
              if (cur != null && cmp == 0) cur else nullRight))
          }
        }
      } else {
        // O(1) held state: the latest eligible right row for the
        // current left key (copied — iterators reuse row buffers).
        var held: InternalRow = null
        var heldKey: Any = null

        lIter.map { l =>
          val lkRef = lKeyB.eval(l)
          val ltRef = lTsB.eval(l)
          if (lkRef == null) {
            project(joiner(l, nullRight))
          } else {
            val lk = lkRef
            if (held != null && keyOrd.compare(heldKey, lk) != 0) held = null
            if (ltRef == null) {
              // Null event time matches nothing, but the right cursor
              // must NOT advance past rows later left rows still need.
              project(joiner(l, nullRight))
            } else {
              val lt = ltRef.asInstanceOf[Long]
              // Consume every right row at or before (lk, lt): rows of
              // smaller keys are dead (left keys only grow), rows of
              // this key become the held match (last one wins = the
              // greatest (ts, tie) within bound, thanks to the order).
              var cmp = if (cur == null) 1 else keyOrd.compare(curKey, lk)
              while (cur != null && (cmp < 0 || (cmp == 0 && curTs <= lt))) {
                if (cmp == 0) { held = cur.copy(); heldKey = copyKey(curKey) }
                advance()
                if (cur != null) cmp = keyOrd.compare(curKey, lk)
              }
              project(joiner(l, if (held != null) held else nullRight))
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** DataFrame-level entry point. */
object NativeAsOfJoin {

  /** Backward as-of join of `left` to `right` on an equality key and
    * µs event times (see class doc for semantics). All five columns
    * must be LongType on their side; right payload columns come back
    * `r_`-prefixed like `AsOfJoin.backward`.
    */
  def backward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String = "r_"): DataFrame =
    joinImpl(left, right, keyCol, leftTsCol, rightTsCol, rightTieCol,
      rightPrefix, fwd = false)

  /** Forward as-of join: the single earliest right row with
    * `r.ts >= l.ts` (inclusive), ties to the smallest tie column —
    * the native mirror of `AsOfJoin.forward`, same physical contract
    * as `backward` (one merge pass, zero exchanges on bucketed input).
    */
  def forward(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String = "r_"): DataFrame =
    joinImpl(left, right, keyCol, leftTsCol, rightTsCol, rightTieCol,
      rightPrefix, fwd = true)

  private def joinImpl(
      left: DataFrame,
      right: DataFrame,
      keyCol: String,
      leftTsCol: String,
      rightTsCol: String,
      rightTieCol: String,
      rightPrefix: String,
      fwd: Boolean): DataFrame = {
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    val lPlan = bridge.analyzed(left)
    // Re-alias the right side with FRESH attribute ids: both inputs
    // may share lineage (self-join on the same table), and duplicate
    // exprIds across the two children would make column pruning /
    // binding resolve the right side's key to the left's attribute
    // and prune it away. Join gets this from the analyzer's
    // dedupRight; a custom node must do it itself.
    val rAnalyzed = bridge.analyzed(right)
    val rAliases = rAnalyzed.output.map(a => Alias(a, a.name)())
    val rPlan: LogicalPlan = Project(rAliases, rAnalyzed)
    def attr(plan: LogicalPlan, name: String): Attribute =
      plan.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"column $name not found"))
    // The exec's merge requires 64-bit ts/tie; the KEY may be any
    // orderable type (compared through its interpreted ordering), and
    // must agree across the sides.
    Seq(attr(lPlan, leftTsCol), attr(rPlan, rightTsCol),
      attr(rPlan, rightTieCol)).foreach { a =>
      require(a.dataType == org.apache.spark.sql.types.LongType,
        s"NativeAsOfJoin: ${a.name} must be BIGINT (project timestamps " +
          "to unix_micros first)")
    }
    val (lKeyAttr, rKeyAttr) = (attr(lPlan, keyCol), attr(rPlan, keyCol))
    require(lKeyAttr.dataType == rKeyAttr.dataType,
      s"NativeAsOfJoin: key $keyCol differs in type across sides " +
        s"(${lKeyAttr.dataType.catalogString} vs ${rKeyAttr.dataType.catalogString})")
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering
        .isOrderable(lKeyAttr.dataType),
      s"NativeAsOfJoin: key type ${lKeyAttr.dataType.catalogString} is not orderable")
    // The strategy + optimizer rules ride on the session's
    // experimental lists so any session can run the node
    // (GraftExtensions also injects them for sessions built with
    // spark.sql.extensions).
    val ss = left.sparkSession
    if (!ss.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      ss.experimental.extraStrategies =
        ss.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    AsOfJoinRules.all.foreach { r =>
      if (!ss.experimental.extraOptimizations.contains(r)) {
        ss.experimental.extraOptimizations =
          ss.experimental.extraOptimizations :+ r
      }
    }
    val node = AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, keyCol), attr(lPlan, leftTsCol),
      attr(rPlan, keyCol), attr(rPlan, rightTsCol), attr(rPlan, rightTieCol),
      forward = fwd)
    val joined = bridge.ofRows(ss, node)
    // Left and right may share column names — rename positionally to
    // unique temporaries before the final projection.
    import org.apache.spark.sql.functions.col
    val nL = left.columns.length
    val tmp = joined.columns.indices.map(i => s"__c$i")
    val renamed = joined.toDF(tmp: _*)
    val leftCols = left.columns.zipWithIndex.map {
      case (c, i) => col(s"__c$i").as(c)
    }
    val rightCols = right.columns.zipWithIndex.collect {
      case (c, j) if c != keyCol => col(s"__c${nL + j}").as(s"$rightPrefix$c")
    }
    renamed.select(leftCols ++ rightCols: _*)
  }
}
