package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftExpressionBridge, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native backward as-of join — the SURVEY §4.3(c) showcase: a whole
  * custom operator (LogicalPlan + SparkStrategy + SparkPlan) for a shape
  * Spark SQL lacks. For every right row, attach the latest left row of
  * the same key whose (ts, tie) is lexicographically <= the right row's —
  * identical semantics (including timestamp ties) to the window-based
  * [[graft.ops.Temporal.asofPrior]] union trick.
  *
  * Physical plan: both sides hash-partitioned on the key and sorted by
  * (key, ts, tie) — EnsureRequirements inserts the exchanges/sorts — then
  * a single forward merge per partition: O(|L| + |R|), no range-join
  * explosion, no window buffering of the right side. This is the plan a
  * dedicated time-series engine runs, expressed as first-class Catalyst.
  *
  * Null semantics (SQL-comparison-consistent, merge-order-sound):
  * null keys never match (either side); a null LEFT ts row matches no
  * right row and is skipped by the merge; a null RIGHT ts row gets null
  * left columns. Tie columns compare under a nulls-first total order —
  * the same order the required SortOrder sorts them by — so ties stay
  * deterministic even with null tiebreaks.
  */
final case class AsOfJoin(left: LogicalPlan, right: LogicalPlan,
                          leftKey: Expression, leftTs: Expression, leftTie: Expression,
                          rightKey: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoin =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoin]] as [[AsOfJoinExec]]; a no-op for every other node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoin(l, r, lk, lts, ltie, rk, rts, rtie) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, lts, ltie, rk, rts, rtie) :: Nil
    case _ => Nil
  }
}

final case class AsOfJoinExec(left: SparkPlan, right: SparkPlan,
                              leftKey: Expression, leftTs: Expression, leftTie: Expression,
                              rightKey: Expression, rightTs: Expression, rightTie: Expression)
    extends BinaryExecNode {

  override def output: Seq[Attribute] =
    right.output ++ left.output.map(_.withNullability(true))

  // co-partition both sides on the key (EnsureRequirements makes the two
  // ClusteredDistributions compatible, exactly as for sort-merge join)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  // in-partition sort by (key, ts, tie) on both sides drives the merge
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending),
      SortOrder(leftTie, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightTie, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lk = BindReferences.bindReference(leftKey, left.output)
    val lts = BindReferences.bindReference(leftTs, left.output)
    val ltie = BindReferences.bindReference(leftTie, left.output)
    val rk = BindReferences.bindReference(rightKey, right.output)
    val rts = BindReferences.bindReference(rightTs, right.output)
    val rtie = BindReferences.bindReference(rightTie, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val tieOrd = TypeUtils.getInterpretedOrdering(leftTie.dataType)
    // interpreted orderings don't accept nulls; nulls-first matches the
    // Ascending SortOrder both children are sorted by
    def nullsFirst(ord: Ordering[Any], a: Any, b: Any): Int =
      if (a == null && b == null) 0
      else if (a == null) -1
      else if (b == null) 1
      else ord.compare(a, b)
    val leftWidth = left.output.size
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val joined = new JoinedRow
      val nullLeft = new GenericInternalRow(leftWidth)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)

      var lHead: InternalRow = null
      def advance(): Unit =
        lHead = if (lIter.hasNext) lIter.next() else null
      advance()

      // latest matching left row so far (copied out of the iterator) and
      // its key, for cheap discard when the right key moves on
      var curLeft: InternalRow = null
      var curLeftKey: Any = null

      rIter.map { rRow =>
        val k = rk.eval(rRow)
        if (k == null) {
          curLeft = null; curLeftKey = null
          proj(joined(rRow, nullLeft))
        } else {
          if (curLeft != null && keyOrd.compare(curLeftKey, k) != 0) {
            curLeft = null; curLeftKey = null
          }
          val t = rts.eval(rRow)
          if (t == null) {
            // null right ts: no left row can be "at or before" it
            proj(joined(rRow, nullLeft))
          } else {
            val tie = rtie.eval(rRow)
            var done = lHead == null
            while (!done) {
              val hk = lk.eval(lHead)
              val c = if (hk == null) -1 else keyOrd.compare(hk, k)
              if (c < 0) advance() // behind the right key (or null key): drop
              else if (c > 0) done = true
              else {
                val ht = lts.eval(lHead)
                if (ht == null) advance() // null left ts matches nothing: drop
                else {
                  val cmpTs = tsOrd.compare(ht, t)
                  val within = cmpTs < 0 ||
                    (cmpTs == 0 && nullsFirst(tieOrd, ltie.eval(lHead), tie) <= 0)
                  if (within) {
                    curLeft = lHead.copy(); curLeftKey = hk
                    advance()
                  } else done = true
                }
              }
              if (lHead == null) done = true
            }
            proj(joined(rRow, if (curLeft != null) curLeft else nullLeft))
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)
}

/** Predicate pushdown through [[AsOfJoin]] — the custom `Rule` half of
  * the extension story: Catalyst's own `PushDownPredicates` cannot see
  * through an unknown node, so without this rule a filter above an as-of
  * join blocks all scan pushdown. Soundness:
  *
  *  - a conjunct referencing only RIGHT columns commutes with the join
  *    (the join emits exactly one output row per right row);
  *  - a conjunct on the bare right KEY also mirrors to the left child
  *    (matches require equal keys, so left rows failing it can never
  *    join a surviving right row) — the original conjunct still moves to
  *    the right side only; the mirror is an extra pruning filter;
  *  - only DETERMINISTIC conjuncts move (same check as Catalyst's
  *    PushDownPredicates): a non-deterministic predicate (rand()-based
  *    sampling, …) must keep its post-join evaluation order, and
  *    mirroring one would evaluate it twice with independent draws.
  */
object AsOfJoinFilterPushdown
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet}
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, aj: AsOfJoin) =>
      val (pushable, rest) = splitConjunctivePredicates(cond)
        .partition(p => p.deterministic && p.references.subsetOf(aj.right.outputSet))
      if (pushable.isEmpty) f
      else {
        val newRight = Filter(pushable.reduce(And), aj.right)
        val newLeft = (aj.leftKey, aj.rightKey) match {
          case (lk: Attribute, rk: Attribute) =>
            val keyOnly = pushable.filter(_.references == AttributeSet(rk :: Nil))
            if (keyOnly.isEmpty) aj.left
            else Filter(
              keyOnly.map(_.transform { case a: Attribute if a.semanticEquals(rk) => lk })
                .reduce(And), aj.left)
          case _ => aj.left
        }
        val pushed = aj.copy(left = newLeft, right = newRight)
        if (rest.isEmpty) pushed else Filter(rest.reduce(And), pushed)
      }
  }
}

/** `spark.sql.extensions=graft.plans.GraftExtensions` — config-based
  * registration of the as-of strategy + pushdown rule for sessions we
  * don't construct.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectPlannerStrategy(_ => AsOfJoinStrategy)
    e.injectOptimizerRule(_ => AsOfJoinFilterPushdown)
  }
}

object AsOf {
  /** Idempotently make [[AsOfJoinStrategy]] + [[AsOfJoinFilterPushdown]]
    * available on an existing session (for sessions built without
    * `spark.sql.extensions`).
    */
  def register(spark: SparkSession): Unit = {
    val exp = spark.experimental
    if (!exp.extraStrategies.contains(AsOfJoinStrategy))
      exp.extraStrategies = exp.extraStrategies :+ AsOfJoinStrategy
    if (!exp.extraOptimizations.contains(AsOfJoinFilterPushdown))
      exp.extraOptimizations = exp.extraOptimizations :+ AsOfJoinFilterPushdown
  }

  /** Backward as-of join of two DataFrames on `key`: each right row gains
    * every left column (null when no left row precedes it). Columns are
    * re-aliased on both sides before plan construction so the two
    * subtrees never share attribute ids (safe for self-as-of).
    */
  def asofJoin(left: DataFrame, right: DataFrame,
               key: String, ts: String, tie: String,
               leftPrefix: String = "l_"): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val l = left.select(left.columns.map(c => col(c).as(s"$leftPrefix$c")).toSeq: _*)
    val lp = GraftExpressionBridge.logicalPlan(l)
    val rp = GraftExpressionBridge.logicalPlan(right)
    def attr(p: LogicalPlan, name: String): Expression =
      p.output.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no column $name in ${p.output.map(_.name)}"))
    GraftExpressionBridge.ofRows(spark, AsOfJoin(lp, rp,
      attr(lp, s"$leftPrefix$key"), attr(lp, s"$leftPrefix$ts"), attr(lp, s"$leftPrefix$tie"),
      attr(rp, key), attr(rp, ts), attr(rp, tie)))
  }

  /** FORWARD as-of join: each right row gains the EARLIEST left row at or
    * after it — next-touch attribution. Expressed through the same
    * backward operator by running it on negated event time (epoch micros)
    * and tiebreak: "latest left with (-ts, -tie) <= (-rts, -rtie)" is
    * exactly "earliest left with (ts, tie) >= (rts, rtie)". The original
    * timestamp columns pass through untouched; only the merge ordering is
    * negated.
    */
  def asofJoinForward(left: DataFrame, right: DataFrame,
                      key: String, ts: String, tie: String,
                      leftPrefix: String = "l_"): DataFrame = {
    import org.apache.spark.sql.functions.unix_micros
    val negL = left.withColumn("__neg_ts", -unix_micros(col(ts)))
      .withColumn("__neg_tie", -col(tie))
    val negR = right.withColumn("__neg_ts", -unix_micros(col(ts)))
      .withColumn("__neg_tie", -col(tie))
    asofJoin(negL, negR, key, "__neg_ts", "__neg_tie", leftPrefix)
      .drop("__neg_ts", "__neg_tie",
        s"${leftPrefix}__neg_ts", s"${leftPrefix}__neg_tie")
  }
}
