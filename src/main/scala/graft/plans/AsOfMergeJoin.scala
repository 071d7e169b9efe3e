package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col

/** Native Catalyst as-of join — the (c)-tier custom-operator path:
  * a logical node + planner strategy + physical sort-merge `SparkPlan`.
  *
  * Spark itself has only a LOGICAL `AsOfJoin` (the pandas-on-Spark
  * `merge_asof` entry point) which the optimizer REWRITES into a
  * filtered equi-join + aggregation (`RewriteAsOfJoin`) — there is no
  * physical as-of operator in stock Spark. This is one: both sides are
  * hash-clustered on the key (Catalyst's `EnsureRequirements` inserts
  * co-partitioned exchanges exactly as it does for `SortMergeJoinExec`)
  * and sorted within partitions on (key, ts), then a single O(|L|+|R|)
  * forward-merge pass attaches to each left row the LAST right row with
  * the same key and right.ts <= left.ts.
  *
  * Scale shape vs the composed union+window form (`AsOfJoin.asof`):
  * identical shuffle cost (one exchange per side, keyed on the join
  * key), but no window state and no union widening — each task streams
  * two sorted iterators with O(1) carried state (the current candidate
  * row), so task memory is independent of key group size. The composed
  * form remains the pure-DataFrame fallback; `AsOfJoinNativeSpec` pins
  * the two equal on adversarial inputs.
  *
  * Tie semantics match the composed form: among right rows equal on
  * (key, ts), the greatest payload struct wins (the right sort order
  * appends the payload columns when orderable, and the merge keeps the
  * LAST qualifying row). Left rows with no qualifying right row emit
  * null payload fields.
  */
object AsOfMergeJoin {

  /** Logical node. Children are ALREADY-ANALYZED plans (built from
    * DataFrames); expressions are resolved attribute references into
    * them, so the analyzer passes the node through unchanged. */
  case class GraftAsOfJoin(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTs: Expression,
      rightTs: Expression,
      payload: Seq[Attribute]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): GraftAsOfJoin =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: one pattern, one physical candidate. Installed
    * per-session (idempotently) by `asof`, or cluster-wide via
    * `graft.GraftExtensions`. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case GraftAsOfJoin(l, r, lk, rk, lts, rts, pay) =>
        AsOfMergeJoinExec(lk, rk, lts, rts, pay, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical sort-merge as-of join. */
  case class AsOfMergeJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTs: Expression,
      rightTs: Expression,
      payload: Seq[Attribute],
      left: SparkPlan,
      right: SparkPlan) extends SparkPlan with BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ payload.map(_.withNullability(true))

    // Both children hash-clustered on the key → EnsureRequirements
    // co-partitions them (same mechanism as SortMergeJoinExec).
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // Within-partition sort: (key, ts) both sides; the right side adds
    // the payload columns as a deterministic tie-break when orderable
    // ("last qualifying row wins" then means greatest payload, matching
    // the composed form's documented tie rule).
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
      val rTie: Seq[Expression] =
        if (payload.forall(p => RowOrdering.isOrderable(p.dataType))) payload
        else Nil
      Seq(
        (leftKeys :+ leftTs).map(SortOrder(_, Ascending)),
        ((rightKeys :+ rightTs) ++ rTie).map(SortOrder(_, Ascending)))
    }

    // Pass the left side's properties through: the merge emits left
    // rows in their incoming order, one output row per left row.
    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = left.outputOrdering

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lTsBound = BindReferences.bindReference(leftTs, lOut)
      val rTsBound = BindReferences.bindReference(rightTs, rOut)
      val keyTypes = leftKeys.map(_.dataType)
      val tsOrdering =
        TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val payloadAttrs = payload
      val numPayload = payload.length
      val outAttrs = output

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
        val resultProj = UnsafeProjection.create(outAttrs, lOut ++ payloadAttrs)
        val nullPayload = new GenericInternalRow(numPayload)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        // Carried candidate: the last consumed right row whose (key, ts)
        // did not exceed the current left probe. O(1) state per task.
        var candKey: UnsafeRow = null
        var candPayload: UnsafeRow = null

        lIter.map { lRow =>
          val lKey = lKeyProj(lRow)
          val lTs = lTsBound.eval(lRow)
          if (lTs == null) {
            // Null probe time matches nothing (SQL comparison semantics).
            resultProj(joined(lRow, nullPayload))
          } else {
            var advance = true
            while (advance && rBuf.hasNext) {
              val rRow = rBuf.head
              val rKey = rKeyProj(rRow)
              val cmp = keyOrd.compare(rKey, lKey)
              if (cmp < 0) {
                rBuf.next() // earlier key: discard (candKey check gates emit)
              } else if (cmp == 0) {
                val rTs = rTsBound.eval(rRow)
                // Null right ts sorts first under Ascending; it can never
                // satisfy rTs <= lTs, so consume without candidacy.
                if (rTs != null && tsOrdering.lteq(rTs, lTs)) {
                  candKey = rKey.copy()
                  candPayload = payloadProj(rRow).copy()
                  rBuf.next()
                } else if (rTs == null) {
                  rBuf.next()
                } else {
                  advance = false
                }
              } else {
                advance = false
              }
            }
            val matched = candKey != null && keyOrd.compare(candKey, lKey) == 0
            resultProj(joined(lRow, if (matched) candPayload else nullPayload))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** DataFrame entry point — same contract as `AsOfJoin.asof`: attach to
    * each left row the latest right row with equal `key` and
    * `right.ts <= left.ts`, carrying `rightCols` (null when no such
    * row). Output columns: all left columns, then `rightCols`.
    *
    * The right side is pruned AND fresh-aliased before plan
    * construction: pruning is the column-pushdown the optimizer cannot
    * do through an unknown node; aliasing gives the right subtree fresh
    * exprIds so a self-as-of (both sides from one scan) cannot alias
    * attributes across children. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    val rightPruned = right.select(
      col(key).as(s"__rk_$key") +: col(ts).as(s"__rt_$ts") +:
        rightCols.map(c => col(c).as(s"__rp_$c")): _*)
    val lPlan = GraftSqlBridge.analyzed(left)
    val rPlan = GraftSqlBridge.analyzed(rightPruned)
    def attr(out: Seq[Attribute], n: String): Attribute =
      out.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"column $n not found"))
    val plan = GraftAsOfJoin(
      lPlan, rPlan,
      Seq(attr(lPlan.output, key)),
      Seq(attr(rPlan.output, s"__rk_$key")),
      attr(lPlan.output, ts),
      attr(rPlan.output, s"__rt_$ts"),
      rightCols.map(c => attr(rPlan.output, s"__rp_$c")))
    val out = GraftSqlBridge.ofRows(spark, plan)
    // Drop the alias prefixes on the payload for caller-facing names.
    out.select(left.columns.map(col) ++
      rightCols.map(c => col(s"__rp_$c").as(c)): _*)
  }

  /** Idempotently register the planner strategy in this session. */
  def install(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(Strategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    }
}
