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
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DateType, IntegerType, LongType,
  TimestampNTZType, TimestampType}

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
  * merge pass attaches to each left row its as-of match. The full
  * `merge_asof` surface:
  *
  *  - direction BACKWARD (default): the LAST right row with the same
  *    key and right.ts <= left.ts;
  *  - direction FORWARD: the FIRST right row with right.ts >= left.ts;
  *  - `tolerance`: bound on |right.ts − left.ts| in the ts column's
  *    native unit (microseconds for timestamps) — a match outside the
  *    window emits null payload. Backward/forward monotonicity makes
  *    the tolerance a pure emit-time filter: if the nearest qualifying
  *    row is outside the window, every other qualifying row is
  *    farther.
  *
  * Scale shape vs the composed union+window form (`AsOfJoin.asof`):
  * identical shuffle cost (one exchange per side, keyed on the join
  * key), but no window state and no union widening — each task streams
  * two sorted iterators with O(1) carried state (backward: the current
  * candidate row; forward: the most recent (key, ts) tie-run), so task
  * memory is independent of key group size. The composed form remains
  * the pure-DataFrame fallback; `AsOfJoinNativeSpec` pins the two
  * equal on adversarial inputs (forward ≡ composed on negated ts).
  *
  * Tie semantics match the composed form: among right rows equal on
  * (key, ts), the greatest payload struct wins in BOTH directions (the
  * right sort appends the payload columns when orderable; backward
  * keeps the last consumed qualifying row, forward reads to the end of
  * the first qualifying tie-run). Left rows with no qualifying right
  * row emit null payload fields; a null left ts matches nothing; null
  * right ts rows never match; a row with ANY null join-key field is
  * unmatchable on either side (SQL EqualTo semantics — the same rule
  * Spark's stock `RewriteAsOfJoin` equi-join applies, so the
  * `InterceptSparkAsOfJoin` swap stays invisible on null-keyed data).
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
      payload: Seq[Attribute],
      tolerance: Option[Long],
      forward: Boolean) extends BinaryNode {
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
      case GraftAsOfJoin(l, r, lk, rk, lts, rts, pay, tol, fwd) =>
        AsOfMergeJoinExec(lk, rk, lts, rts, pay, tol, fwd,
          planLater(l), planLater(r)) :: Nil
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
      tolerance: Option[Long],
      forward: Boolean,
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
    // (the last row of a (key, ts) tie-run then carries the greatest
    // payload — the documented tie rule, both directions).
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

    /** ts value → its underlying long (micros for timestamps, days for
      * dates) for tolerance arithmetic. */
    private def tsLong(v: Any): Long = v match {
      case l: Long => l
      case i: Int => i.toLong
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"tolerance unsupported for ts value of ${other.getClass}")
    }

    override protected def doExecute(): RDD[InternalRow] = {
      // the interpreted ts ordering below is built from the LEFT type;
      // a differently-typed right ts would miscompare raw native units
      require(leftTs.dataType == rightTs.dataType,
        s"as-of ts type mismatch: ${leftTs.dataType} vs ${rightTs.dataType}")
      val lOut = left.output
      val rOut = right.output
      val lKeyExprs = leftKeys
      val rKeyExprs = rightKeys
      val lTsBound = BindReferences.bindReference(leftTs, lOut)
      val rTsBound = BindReferences.bindReference(rightTs, rOut)
      val keyTypes = leftKeys.map(_.dataType)
      val tsOrdering = org.apache.spark.sql.catalyst.util.TypeUtils
        .getInterpretedOrdering(leftTs.dataType)
      val payloadAttrs = payload
      val numPayload = payload.length
      val outAttrs = output
      val tol = tolerance
      val fwd = forward

      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeyExprs, lOut)
        val rKeyProj = UnsafeProjection.create(rKeyExprs, rOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        val payloadProj = UnsafeProjection.create(payloadAttrs, rOut)
        // bind the output against NULLABLE payload attrs: a
        // non-nullable payload column (common for constructed frames)
        // would otherwise skip the null check and read garbage from
        // the null-payload row of unmatched left rows
        val resultProj = UnsafeProjection.create(outAttrs,
          lOut ++ payloadAttrs.map(_.withNullability(true)))
        val nullPayload = new GenericInternalRow(numPayload)
        val joined = new JoinedRow
        val rBuf = rIter.buffered

        // Carried candidate (backward: last qualifying row; forward:
        // the most recent fully-read (key, ts) tie-run). O(1) state.
        var candKey: UnsafeRow = null
        var candTs: Any = null
        var candPayload: UnsafeRow = null

        def withinTol(lTs: Any): Boolean = tol.forall { t =>
          val diff =
            if (fwd) tsLong(candTs) - tsLong(lTs)
            else tsLong(lTs) - tsLong(candTs)
          diff <= t
        }

        def emit(lRow: InternalRow, lKey: UnsafeRow, lTs: Any): UnsafeRow = {
          val matched = candKey != null &&
            keyOrd.compare(candKey, lKey) == 0 &&
            (if (fwd) candTs != null && tsOrdering.gteq(candTs, lTs) else true) &&
            withinTol(lTs)
          resultProj(joined(lRow, if (matched) candPayload else nullPayload))
        }

        // Null-key rows are UNMATCHABLE — SQL equi-join semantics
        // (EqualTo never matches null), the same rule Spark's stock
        // RewriteAsOfJoin applies. A null-keyed left probe
        // short-circuits to null payload below; null-keyed RIGHT rows
        // need no explicit skip: a right key containing null compares
        // equal only to a probe key with the same null field (natural
        // ordering), and every such probe short-circuits before it can
        // scan or cache — so a null-keyed right row is only ever
        // consumed as cmp<0 fodder, never cached as a candidate.
        if (!fwd) {
          // BACKWARD: consume right rows while (key, ts) <= probe;
          // the last qualifying consumed row is the match.
          lIter.map { lRow =>
            val lKey = lKeyProj(lRow)
            val lTs = lTsBound.eval(lRow)
            if (lTs == null || lKey.anyNull) {
              resultProj(joined(lRow, nullPayload))
            } else {
              var advance = true
              while (advance && rBuf.hasNext) {
                val rRow = rBuf.head
                val rKey = rKeyProj(rRow)
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) {
                  rBuf.next() // earlier key (candKey check gates emit)
                } else if (cmp == 0) {
                  val rTs = rTsBound.eval(rRow)
                  if (rTs == null) {
                    rBuf.next() // null ts never matches
                  } else if (tsOrdering.lteq(rTs, lTs)) {
                    candKey = rKey.copy()
                    candTs = rTs
                    candPayload = payloadProj(rRow).copy()
                    rBuf.next()
                  } else {
                    advance = false
                  }
                } else {
                  advance = false
                }
              }
              emit(lRow, lKey, lTs)
            }
          }
        } else {
          // FORWARD: the cached tie-run (candKey, candTs) serves every
          // probe with lTs <= candTs; a stale cache (candTs < lTs or
          // earlier key) re-reads from the stream. Rows skipped have
          // ts < lTs and can never serve a later (larger-ts) probe.
          lIter.map { lRow =>
            val lKey = lKeyProj(lRow)
            val lTs = lTsBound.eval(lRow)
            if (lTs == null || lKey.anyNull) {
              resultProj(joined(lRow, nullPayload))
            } else {
              var done = candKey != null &&
                keyOrd.compare(candKey, lKey) == 0 &&
                candTs != null && tsOrdering.gteq(candTs, lTs)
              while (!done && rBuf.hasNext) {
                val rRow = rBuf.head
                val rKey = rKeyProj(rRow)
                val cmp = keyOrd.compare(rKey, lKey)
                if (cmp < 0) {
                  rBuf.next()
                } else if (cmp == 0) {
                  val rTs = rTsBound.eval(rRow)
                  if (rTs == null || tsOrdering.lt(rTs, lTs)) {
                    rBuf.next() // unusable for this and all later probes
                  } else {
                    // first qualifying row: read its whole (key, ts)
                    // tie-run; the run's last row has the greatest
                    // payload under the right sort order
                    val runKey = rKey.copy()
                    val runTs = rTs
                    var pay = payloadProj(rRow).copy()
                    rBuf.next()
                    var run = true
                    while (run && rBuf.hasNext) {
                      val nRow = rBuf.head
                      val nKey = rKeyProj(nRow)
                      if (keyOrd.compare(nKey, runKey) == 0) {
                        val nTs = rTsBound.eval(nRow)
                        if (nTs != null && tsOrdering.equiv(nTs, runTs)) {
                          pay = payloadProj(nRow).copy()
                          rBuf.next()
                        } else run = false
                      } else run = false
                    }
                    candKey = runKey; candTs = runTs; candPayload = pay
                    done = true
                  }
                } else {
                  done = true // no right rows for this key at >= lTs
                }
              }
              emit(lRow, lKey, lTs)
            }
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** DataFrame entry point — the `merge_asof` contract: attach to each
    * left row the latest (backward) or earliest (forward) right row
    * with equal `key` and right.ts on the matching side of `left.ts`,
    * within `tolerance` when given, carrying `rightCols` (null when no
    * such row). Output columns: all left columns, then `rightCols`.
    *
    * `tolerance` is in the ts column's NATIVE unit: microseconds for
    * TIMESTAMP/TIMESTAMP_NTZ, days for DATE, the raw value for
    * integral ts columns.
    *
    * The right side is pruned AND fresh-aliased before plan
    * construction: pruning is the column-pushdown the optimizer cannot
    * do through an unknown node; aliasing gives the right subtree fresh
    * exprIds so a self-as-of (both sides from one scan) cannot alias
    * attributes across children. */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String], tolerance: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // Mixed ts types would compare raw underlying values in different
    // native units (DATE days vs TIMESTAMP micros; INT vs LONG) — both
    // the interpreted ordering (built from the LEFT type) and the
    // tolerance arithmetic would be silently wrong. Refuse up front;
    // the caller casts explicitly.
    require(left.schema(ts).dataType == right.schema(ts).dataType,
      s"as-of ts type mismatch: left ${left.schema(ts).dataType} vs " +
        s"right ${right.schema(ts).dataType} — cast one side explicitly")
    tolerance.foreach { _ =>
      val t = left.schema(ts).dataType
      require(Seq(TimestampType, TimestampNTZType, DateType, LongType,
        IntegerType).contains(t),
        s"tolerance unsupported for ts type $t")
    }
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
      rightCols.map(c => attr(rPlan.output, s"__rp_$c")),
      tolerance, forward)
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

  /** Analyzer rule (injected post-hoc resolution, `GraftExtensions`):
    * route Spark's OWN logical `AsOfJoin` — the node pandas-on-Spark's
    * `merge_asof` builds — into [[GraftAsOfJoin]], so sessions carrying
    * the extensions execute merge_asof on the native sort-merge exec
    * instead of the stock `RewriteAsOfJoin` join+aggregate expansion
    * (which joins EVERY qualifying right row per left row before
    * aggregating them back down).
    *
    * Deliberately narrow: left-outer, ≥1 equi-key, inclusive backward
    * (`l >= r`) or forward (`l <= r`) comparison, no tolerance — the
    * default merge_asof shape. Anything else (strict inequality,
    * nearest, tolerance intervals, keyless) falls through untouched to
    * Spark's rewrite. On (key, ts) ties the stock rewrite's min_by
    * keeps an ARBITRARY extremal row; the native exec keeps the
    * greatest-payload one — a deterministic refinement within the same
    * contract. Output attribute ids/nullability are preserved exactly
    * (payload = the full right output), so the swap is invisible to
    * the rest of the plan. */
  object InterceptSparkAsOfJoin
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {
    import org.apache.spark.sql.catalyst.expressions.{
      And, EqualTo, GreaterThanOrEqual, LessThanOrEqual}
    import org.apache.spark.sql.catalyst.plans.LeftOuter
    import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin => SparkAsOfJoin}

    private def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(a, b) => conjuncts(a) ++ conjuncts(b)
      case other => Seq(other)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
      case j @ SparkAsOfJoin(left, right, asOfCond, Some(cond), LeftOuter, _, _)
          if j.resolved =>
        val sides = asOfCond match {
          case GreaterThanOrEqual(l, r)
              if l.references.subsetOf(left.outputSet) &&
                r.references.subsetOf(right.outputSet) =>
            Some((l, r, false)) // backward: latest right.ts <= left.ts
          case LessThanOrEqual(l, r)
              if l.references.subsetOf(left.outputSet) &&
                r.references.subsetOf(right.outputSet) =>
            Some((l, r, true)) // forward: earliest right.ts >= left.ts
          case _ => None
        }
        val keyPairs = conjuncts(cond).map {
          case EqualTo(a, b)
              if a.references.subsetOf(left.outputSet) &&
                b.references.subsetOf(right.outputSet) => Some((a, b))
          case EqualTo(a, b)
              if b.references.subsetOf(left.outputSet) &&
                a.references.subsetOf(right.outputSet) => Some((b, a))
          case _ => None
        }
        sides match {
          case Some((lTs, rTs, fwd))
              if keyPairs.nonEmpty && keyPairs.forall(_.isDefined) &&
                // analyzer type coercion should have aligned the ts
                // sides; if it somehow has not, fall through to the
                // stock rewrite rather than miscompare native units
                lTs.dataType == rTs.dataType =>
            GraftAsOfJoin(left, right,
              keyPairs.flatten.map(_._1), keyPairs.flatten.map(_._2),
              lTs, rTs, right.output, None, fwd)
          case _ => j
        }
    }
  }
}
