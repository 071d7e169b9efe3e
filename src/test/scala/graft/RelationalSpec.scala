package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpecBase {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle") {
    assert(Relational.queries.keySet == Relational.oracleSql.keySet)
  }

  test("q1 exact sums are stable under repartitioning (order-independence)") {
    val li = Tables.lineitem(spark, sf)
    val a = Relational.q1Pipeline(li).collect().map(_.toSeq).toSeq
    // Same aggregation over differently-partitioned (and therefore
    // differently-ordered-per-partition) input must be bit-identical:
    // the int64-cents sums make accumulation order irrelevant. A plain
    // double sum would diverge here.
    val b = Relational.q1Pipeline(li.repartition(13)).collect().map(_.toSeq).toSeq
    val c = Relational.q1Pipeline(
      li.repartitionByRange(7, org.apache.spark.sql.functions.col("l_suppkey").desc))
      .collect().map(_.toSeq).toSeq
    assert(a == b)
    assert(a == c)
  }

  test("q2 pushes filters and prunes columns at the parquet scan") {
    val plan = planOf(Relational.q2FilterProject(spark, sf))
    assert(plan.contains("PushedFilters:"), "no pushed filters in plan")
    assert(plan.contains("l_shipdate"), "shipdate filter not pushed")
    assert(plan.contains("ReadSchema"), "no read schema")
    // pruned scan must not read l_comment-ish unused columns (schema has 11
    // cols; the projection needs 6 incl. filter cols)
    assert(!plan.contains("l_returnflag"), "unused column not pruned")
  }

  test("q3/q4 dimension joins broadcast") {
    assert(planOf(Relational.q3JoinAggTopK(spark, sf))
      .contains("BroadcastHashJoin"), "q3 customer join not broadcast")
    assert(planOf(Relational.q4BroadcastJoin(spark, sf))
      .contains("BroadcastHashJoin"), "q4 dims not broadcast")
  }

  test("q6 top-k plans TakeOrdered, not a global sort") {
    val plan = planOf(Relational.q6SortLimit(spark, sf))
    assert(plan.contains("TakeOrderedAndProject"), s"expected TakeOrdered:\n$plan")
  }

  test("q13 quantiles come from the value histogram, not a buffering percentile agg") {
    val plan = planOf(Relational.q13DistinctQuantiles(spark, sf))
    assert(!plan.contains("percentile"),
      s"q13 regressed to the per-group value-buffering percentile:\n$plan")
  }

  test("q3 pre-aggregates lineitem below the join (partial-agg pushdown)") {
    val plan = planOf(Relational.q3JoinAggTopK(spark, sf))
    // the lineitem-side aggregate must appear under the orderkey join:
    // two grouping levels → at least two HashAggregate pairs
    assert(plan.split("HashAggregate").length - 1 >= 4,
      s"q3 lost the per-order pre-aggregation:\n$plan")
  }

  test("q5 latest-per-key returns one row per customer") {
    val df = Relational.q5WindowLatest(spark, sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }
}
