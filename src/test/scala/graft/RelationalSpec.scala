package graft

import graft.operators.Relational

class RelationalSpec extends SparkSpecBase {

  test("every relational query runs and returns rows at sf0.001") {
    Relational.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows")
    }
  }

  test("every relational query has an oracle (q22 included, via its envelope booleans)") {
    // q22's raw sketch estimates are engine-specific, but its OUTPUT is
    // engine-portable (exact values + in-envelope booleans), so it is
    // hash-gated like everything else
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

  test("q15 frame windows share one exchange; frame math checks out per customer") {
    import org.apache.spark.sql.functions.col
    val df = Relational.q15WindowFrames(spark, sf)
    // three windows, one partitioning: a single hash exchange on
    // o_custkey must serve the ROWS and RANGE frames (differing only in
    // sort key, which re-sorts but never re-shuffles)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(planOf(df)).size
    assert(shuffles == 1, s"expected 1 hash exchange for all frames, got $shuffles")
    // r18: the ROWS and RANGE frames share ONE staged od_days ordering,
    // so the whole stack sorts once inside the partition — the only
    // other Sort is the presentation tail (2 total; before r18 the
    // RANGE window re-sorted on its own unix_date expression: 3)
    val sorts = "\\bSort\\b".r.findAllIn(planOf(df)).size
    assert(sorts <= 2, s"expected <= 2 Sorts (1 window + presentation), got $sorts")
    // frame semantics, re-derived per customer from the raw orders
    val cust = Tables.orders(spark, sf)
      .filter(col("o_custkey") === 7L)
      .select("o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toEpochSecond(java.time.ZoneOffset.UTC) * 1000L,
        r.getDouble(2)))
      .sortBy { case (k, d, _) => (d, k) }
    assert(cust.length >= 3, "custkey 7 needs >= 3 orders for the frame check")
    val got = df.filter(col("o_custkey") === 7L)
      .orderBy(col("o_orderkey"))
      .collect()
      .map(r => r.getLong(1) ->
        (r.getDouble(3), r.getDouble(4), r.getLong(5))).toMap
    def centsOf(p: Double) = math.round(p * 100)
    cust.zipWithIndex.foreach { case ((key, date, _), i) =>
      val frame = cust.slice(math.max(0, i - 2), i + 1)
      val wantM = frame.map(t => centsOf(t._3)).sum.toDouble / (100.0 * frame.length)
      val wantC = cust.take(i + 1).map(t => centsOf(t._3)).sum.toDouble / 100.0
      val cutoff = date - 30L * 86400 * 1000
      val want30 = cust.count(t => t._2 >= cutoff && t._2 <= date)
      val (gm, gc, g30) = got(key)
      assert(gm == wantM, s"mavg3 at order $key: $gm != $wantM")
      assert(gc == wantC, s"cum_spend at order $key: $gc != $wantC")
      assert(g30 == want30.toLong, s"n_orders_30d at order $key: $g30 != $want30")
    }
  }

  test("q16 pivot: composite-key pre-aggregation feeds the reshape, no value-discovery pass") {
    import org.apache.spark.sql.functions.col
    val df = Relational.q16Pivot(spark, sf)
    // static pivot values → no driver-side distinct job; the first
    // aggregate runs on the COMPOSITE (group, pivot) key (map-side
    // combine crushes the fact table before any exchange) and the
    // pivotfirst reshape only ever sees pre-aggregated rows
    val plan = planOf(df)
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 2, s"expected pre-agg + reshape exchanges, got $shuffles:\n$plan")
    assert(plan.contains("pivotfirst"), s"no pivotfirst reshape in plan:\n$plan")
    assert(
      "Exchange hashpartitioning\\(o_orderpriority[^)]*o_orderstatus".r
        .findFirstIn(plan).isDefined,
      s"first exchange is not on the composite (group, pivot) key:\n$plan")
    // wide counts reconcile with the plain groupBy — no rows lost or
    // double-counted by the reshape
    val wide = df.collect().map(r => r.getString(0) ->
      (r.getLong(1) + r.getLong(3) + r.getLong(5))).toMap
    val long = Tables.orders(spark, sf).groupBy(col("o_orderpriority")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(wide == long, s"pivot row counts diverge from groupBy: $wide vs $long")
  }

  test("q17 decorrelated-average predicate matches a per-customer recomputation") {
    import org.apache.spark.sql.functions.col
    val df = Relational.q17CorrelatedAvg(spark, sf)
    assert(!planOf(df).contains("CartesianProduct"),
      "decorrelation fell back to a cartesian product")
    val all = Tables.orders(spark, sf)
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    def centsOf(p: Double) = math.round(p * 100)
    val byCust = all.groupBy(_._2).map { case (c, rows) =>
      c -> (rows.map(t => centsOf(t._3)).sum, rows.length.toLong)
    }
    val want = all.filter { case (_, c, p) =>
      val (sumC, n) = byCust(c); centsOf(p) * n > sumC
    }.map(_._1).toSet
    val got = df.collect().map(_.getLong(0)).toSet
    assert(got == want, s"predicate divergence: ${(got diff want).take(3)} extra, " +
      s"${(want diff got).take(3)} missing")
    assert(got.nonEmpty && got.size < all.length, "filter should be selective")
  }

  test("q5 latest-per-key returns one row per customer") {
    val df = Relational.q5WindowLatest(spark, sf)
    assert(df.count() == df.select("o_custkey").distinct().count())
  }

  test("q18 unpivot: aggregate-then-melt — narrow Expand, one data shuffle") {
    import org.apache.spark.sql.functions.col
    val df = Relational.q18Unpivot(spark, sf)
    val plan = planOf(df)
    // the melt is an Expand PROJECTION above the aggregate — the only
    // hash exchange is the groupBy's. Melting before aggregating would
    // show the same Expand BELOW the exchange and 3× the shuffled rows.
    assert(plan.contains("Expand"), s"unpivot did not plan as Expand:\n$plan")
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected one data shuffle, got $shuffles:\n$plan")
    // wide↔long reconciliation: pivoting the melt back reproduces the
    // direct aggregate exactly (no rows lost, no value mangled by the
    // common-type cast — all three metrics are cents-exact doubles)
    val rows = df.collect()
    val flags = Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count()
    assert(rows.length == 3 * flags, s"${rows.length} rows for $flags flags")
    val long = rows.map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    val wide = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(
        Tables.dollars(org.apache.spark.sql.functions.sum(
          Tables.cents(col("l_quantity")))).as("sum_qty"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    wide.foreach { case (flag, qty) =>
      assert(long((flag, "sum_qty")) == qty, s"melted sum_qty diverges for $flag")
    }
  }

  test("globalRank: exact global rank with ties, no single-partition window") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // 500 rows over 50 heavily-tied values — tie runs must split across
    // range partitions by the id tie-break and still rank globally 1..n
    val df = (1 to 500).map(i => (((i * 7919) % 50).toLong, i.toLong))
      .toDF("v", "id")
    val ranked = Relational.globalRank(df, Seq(col("v").asc, col("id").asc))
    val got = ranked.collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("id"), r.getAs[Long]("rank")))
      .sortBy(t => (t._1, t._2))
    val want = got.map(t => (t._1, t._2)).sorted.zipWithIndex
      .map { case ((v, id), i) => (v, id, i + 1L) }
    assert(got.toSeq == want.toSeq, "global rank diverges from the sorted order")
    // every window in the plan is partitioned by the materialized range
    // partition id — the whole point: no Window.orderBy-with-no-partition
    val plan = planOf(ranked)
    val specs = "windowspecdefinition\\(".r.findAllIn(plan).size
    val pidSpecs = "windowspecdefinition\\(_graft_pid".r.findAllIn(plan).size
    assert(specs > 0 && specs == pidSpecs,
      s"found a window not partitioned by _graft_pid ($pidSpecs/$specs):\n$plan")
  }

  test("globalRank: collision-safe internal names, fail-fast on rankCol clash") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // an input that already uses the internal pid name must round-trip
    // intact (the implementation picks the next free name)
    val tricky = (1 to 40).map(i => (i.toLong, 1000L + i))
      .toDF("v", "_graft_pid")
    val ranked = Relational.globalRank(tricky, Seq(col("v").desc))
    assert(ranked.columns.toSeq == Seq("v", "_graft_pid", "rank"),
      s"schema mangled: ${ranked.columns.toSeq}")
    val rows = ranked.collect()
      .map(r => (r.getAs[Long]("v"), r.getAs[Long]("_graft_pid"),
        r.getAs[Long]("rank"))).sortBy(_._3)
    assert(rows.map(_._1).toSeq == (40L to 1L by -1L),
      "rank order wrong under pid-name collision")
    assert(rows.forall { case (v, p, _) => p == 1000L + v },
      "caller's _graft_pid column corrupted")
    // an input that already has the OUTPUT column name fails fast…
    val clash = (1 to 5).map(i => (i.toLong, i.toLong)).toDF("v", "rank")
    val err = intercept[IllegalArgumentException] {
      Relational.globalRank(clash, Seq(col("v").asc))
    }
    assert(err.getMessage.contains("rank"), err.getMessage)
    // …and a caller-chosen rankCol sidesteps the clash
    val renamed = Relational.globalRank(clash, Seq(col("v").asc), "global_rank")
    assert(renamed.columns.toSeq == Seq("v", "rank", "global_rank"))
  }

  test("q20 decile: tenths partition the customers, spend cuts are monotone") {
    import org.apache.spark.sql.functions.{col, countDistinct}
    val rows = Relational.q20Decile(spark, sf).collect()
      .map(r => (r.getAs[Long]("decile"), r.getAs[Long]("n_customers"),
        r.getAs[Double]("sum_spend"), r.getAs[Double]("min_spend"),
        r.getAs[Double]("max_spend")))
    assert(rows.map(_._1).toSeq == (1L to 10L), s"deciles: ${rows.map(_._1).toSeq}")
    // the deciles partition the purchasing customers; the closed-form
    // cut makes sizes differ by at most one
    val nCust = Tables.orders(spark, sf)
      .agg(countDistinct(col("o_custkey"))).collect().head.getLong(0)
    assert(rows.map(_._2).sum == nCust, "customers lost or double-counted")
    assert(rows.map(_._2).max - rows.map(_._2).min <= 1, s"ragged deciles: $rows")
    // decile 1 = top spenders; cuts are monotone non-increasing, with
    // equality allowed only when a tie value straddles the boundary
    rows.sliding(2).foreach { case Array(hi, lo) =>
      assert(hi._4 >= lo._5, s"decile ${hi._1} min < decile ${lo._1} max")
    }
    rows.foreach { r => assert(r._4 <= r._5 && r._3 >= r._4) }
  }

  test("saltedJoin: hot key spreads across salts, result ≡ the plain join, plan keyed by salt") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, countDistinct}
    // 90% of fact rows carry ONE key — the skew shape that strands a
    // plain shuffle join on a single task
    val facts = (1L to 2000L)
      .map(i => (if (i <= 1800L) 7L else i % 50L, i, i * 3L))
      .toDF("k", "row_id", "payload")
    val dim = (0L until 50L).map(k => (k, s"dim_$k")).toDF("k", "attr")
    val salted = Relational.saltedJoin(facts, dim, "k",
      Seq(col("row_id")), salts = 8)
    val plain = facts.join(dim, Seq("k"))
    assert(salted.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet
      && salted.count() == plain.count(),
      "salted join diverges from the plain join")
    assert(salted.columns.toSeq == plain.columns.toSeq, "salt leaked into the output")
    // the join is keyed by (k, _salt) whatever strategy AQE picks…
    val plan = planOf(salted)
    assert("Join \\[k#\\d+L?, _salt".r.findAllIn(plan).nonEmpty,
      s"join keys don't include the salt:\n$plan")
    // …and in the regime salting exists for — dim too big to broadcast,
    // so the join shuffles — BOTH exchanges are keyed by (k, _salt):
    // the hot key's rows land on 8 tasks, not 1 (forced here via hint;
    // at scale the planner picks the shuffle join on its own)
    val shuffled = Relational.saltedJoin(facts, dim.hint("shuffle_hash"), "k",
      Seq(col("row_id")), salts = 8)
    val shPlan = planOf(shuffled)
    assert("Exchange hashpartitioning\\([^)]*_salt".r.findAllIn(shPlan).size == 2,
      s"join not partitioned by the salt on both sides:\n$shPlan")
    assert(shuffled.collect().map(_.toSeq).toSet == plain.collect().map(_.toSeq).toSet)
    // the hot key genuinely fans out over the salt space
    val hotSalts = facts.filter(col("k") === 7L)
      .select(org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.xxhash64(col("row_id")), org.apache.spark.sql.functions.lit(8L)).as("s"))
      .agg(countDistinct(col("s"))).collect().head.getLong(0)
    assert(hotSalts == 8L, s"hot key landed on only $hotSalts of 8 salts")
  }

  test("zorder16: interleave is a bijection on 16+16 bits and locality-monotone") {
    import graft.functions.ZOrder
    // spot bijectivity + bit placement against a naive bit loop
    def naive(a: Long, b: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((a >> i) & 1L) << (2 * i)
        z |= ((b >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val rnd = new scala.util.Random(7)
    (1 to 2000).foreach { _ =>
      val a = rnd.nextInt(65536).toLong
      val b = rnd.nextInt(65536).toLong
      assert(ZOrder.interleave16(a, b) == naive(a, b))
    }
    // masking: only the low 16 bits of each dimension participate
    assert(ZOrder.interleave16(65536L + 3L, 0L) == ZOrder.interleave16(3L, 0L))
    // codegen and interpreted paths agree with the kernel
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import graft.functions.GraftFunctions
    val df = (0 until 500).map(_ => (rnd.nextInt(65536).toLong, rnd.nextInt(65536).toLong))
      .toDF("a", "b")
    df.withColumn("z", GraftFunctions.zorder16(col("a"), col("b")))
      .collect().foreach { r =>
        assert(r.getAs[Long]("z") ==
          ZOrder.interleave16(r.getAs[Long]("a"), r.getAs[Long]("b")))
      }
  }

  test("zorderLayout: a 2-D box predicate prunes most files; single-col sort prunes none") {
    import org.apache.spark.sql.functions.{col, input_file_name, max => smax, min => smin}
    val dims = Relational.q23Zorder(spark, sf)
      .select(col("o_orderkey"), col("cust_dim"), col("day_dim"))
    val tmp = java.nio.file.Files.createTempDirectory("graft-zorder").toString
    // layout A: z-ordered across 8 z-contiguous files
    Relational.zorderLayout(dims, col("cust_dim"), col("day_dim"), 8)
      .write.mode("overwrite").parquet(s"$tmp/z")
    // layout B: the same rows sorted by the single orderkey column
    dims.repartitionByRange(8, col("o_orderkey"))
      .sortWithinPartitions(col("o_orderkey"))
      .write.mode("overwrite").parquet(s"$tmp/plain")
    // per-file dim envelopes = what parquet footer min/max give a reader
    def candidateFiles(path: String, loC: Long, hiC: Long, loD: Long, hiD: Long): (Long, Long) = {
      val env = spark.read.parquet(path)
        .groupBy(input_file_name().as("f"))
        .agg(smin(col("cust_dim")).as("c0"), smax(col("cust_dim")).as("c1"),
          smin(col("day_dim")).as("d0"), smax(col("day_dim")).as("d1"))
        .collect()
      val hit = env.count { r =>
        r.getAs[Long]("c1") >= loC && r.getAs[Long]("c0") < hiC &&
          r.getAs[Long]("d1") >= loD && r.getAs[Long]("d0") < hiD
      }
      (hit.toLong, env.length.toLong)
    }
    // a selective box on BOTH dimensions (cust keys run 0-149; order
    // days run ~1096-3500 from the 1992 epoch): ~20% × ~17% of domain
    val (loC, hiC, loD, hiD) = (100L, 130L, 1200L, 1600L)
    val (zHit, zAll) = candidateFiles(s"$tmp/z", loC, hiC, loD, hiD)
    val (pHit, pAll) = candidateFiles(s"$tmp/plain", loC, hiC, loD, hiD)
    assert(zAll == 8 && pAll == 8, s"expected 8 files each, got $zAll/$pAll")
    // single-column-sorted files each span ~the whole 2-D space: no pruning
    assert(pHit >= 7, s"plain layout unexpectedly prunable ($pHit/8)")
    assert(zHit * 2 <= pHit, s"z-layout pruned only to $zHit vs plain $pHit")
    // both layouts return identical rows for the box query
    def rowsOf(path: String) = spark.read.parquet(path)
      .filter(col("cust_dim") >= loC && col("cust_dim") < hiC &&
        col("day_dim") >= loD && col("day_dim") < hiD)
      .select(col("o_orderkey")).collect().map(_.getLong(0)).sorted.toSeq
    assert(rowsOf(s"$tmp/z") == rowsOf(s"$tmp/plain"))
  }

  test("q22 approx tier: exact columns verified, envelope booleans non-vacuous") {
    import org.apache.spark.sql.functions.{col, countDistinct, expr}
    val rows = Relational.q22ApproxAgg(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_orders_exact"),
          r.getAs[Double]("p50_qty_exact"),
          r.getAs[Boolean]("approx_within_rsd"),
          r.getAs[Boolean]("p50_within_band"))).toMap
    // the exact columns equal an independent computation
    val exact = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_orderkey")).as("nd"),
        expr("percentile(l_quantity, 0.5)").as("p50"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("nd"), r.getAs[Double]("p50"), r.getAs[Long]("n"))).toMap
    assert(rows.keySet == exact.keySet)
    exact.foreach { case (flag, (nd, p50, n)) =>
      val (nRows, ndExact, p50Exact, inRsd, inBand) = rows(flag)
      assert(nRows == n && ndExact == nd, s"$flag: exact columns diverge")
      assert(p50Exact == p50, s"$flag: histogram median $p50Exact vs percentile $p50")
      // the booleans the oracle asserts TRUE — and NON-VACUOUSLY so:
      // recompute the sketches independently and check the band calls
      // match what the query emitted
      assert(inRsd && inBand, s"$flag: sketch out of envelope ($inRsd, $inBand)")
    }
    val sketches = Tables.lineitem(spark, sf)
      .groupBy(col("l_returnflag"))
      .agg(expr("approx_count_distinct(l_orderkey, 0.01)").as("nda"),
        expr("percentile_approx(l_quantity, 0.5, 10000)").as("p50a"))
      .collect().map(r => r.getString(0) ->
        (r.getAs[Long]("nda"), r.getAs[Double]("p50a"))).toMap
    exact.foreach { case (flag, (nd, p50, _)) =>
      val (nda, p50a) = sketches(flag)
      assert(math.abs(nda - nd).toDouble <= math.max(5.0, 0.05 * nd),
        s"$flag: independent sketch $nda vs exact $nd outside the band the query claims")
      assert(math.abs(p50a - p50) <= 1.0,
        s"$flag: independent p50 sketch $p50a vs exact $p50 outside the band")
    }
    // determinism: sketches are hash-based, two runs agree exactly
    val again = Relational.q22ApproxAgg(spark, sf).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Long]("n_rows"), r.getAs[Long]("n_orders_exact"),
          r.getAs[Double]("p50_qty_exact"),
          r.getAs[Boolean]("approx_within_rsd"),
          r.getAs[Boolean]("p50_within_band"))).toMap
    assert(again == rows, "approx aggregates are not deterministic")
  }

  test("q19 grouping sets: the asked-for lattice, one scan, margins reconcile") {
    val df = Relational.q19GroupingSets(spark, sf)
    val plan = planOf(df)
    // same single-scan Expand strategy as rollup/cube — the fact table
    // is read once however many sets the lattice lists
    assert(plan.contains("Expand"), s"grouping sets did not plan as Expand:\n$plan")
    assert("FileScan parquet".r.findAllIn(plan).size == 1,
      s"orders scanned more than once:\n$plan")
    val rows = df.collect().map(r => (Option(r.getString(0)), Option(r.getString(1)),
      r.getLong(2), r.getLong(3)))
    // exactly the three requested sets — and NOT the (status, priority)
    // cross that rollup/cube would force: gid 1 = (status), 2 =
    // (priority), 3 = grand total; gid 0 (both present) must be absent
    assert(rows.map(_._3).toSet == Set(1L, 2L, 3L), s"wrong lattice: ${rows.map(_._3).toSet}")
    val statusRows = rows.filter(_._3 == 1L)
    val prioRows = rows.filter(_._3 == 2L)
    val total = rows.filter(_._3 == 3L)
    assert(total.length == 1 && total.head._1.isEmpty && total.head._2.isEmpty)
    // each one-dimensional margin partitions the corpus: counts sum to
    // the grand total independently
    assert(statusRows.map(_._4).sum == total.head._4, "status margin loses rows")
    assert(prioRows.map(_._4).sum == total.head._4, "priority margin loses rows")
    assert(statusRows.forall(r => r._1.nonEmpty && r._2.isEmpty))
    assert(prioRows.forall(r => r._1.isEmpty && r._2.nonEmpty))
  }

  test("q25 window family: all five functions share ONE hash exchange " +
      "(the (cust, price) windows ride the cust partitioning)") {
    val plan = planOf(Relational.q25WindowFuncs(spark, sf))
    val shuffles = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(shuffles == 1, s"window family fragmented into $shuffles exchanges:\n$plan")
    // r18: window definitions are GROUPED BY ORDERING, so the stack
    // sorts once per distinct ordering — (od, okey) and (price) — plus
    // the presentation tail (3 total; the pre-r18 interleaving
    // re-sorted on every alternation: 5)
    val sorts = "\\bSort\\b".r.findAllIn(plan).length
    assert(sorts <= 3, s"expected <= 3 Sorts (2 orderings + presentation), got $sorts")
  }

  test("q24 pagerank: fixed-point ranks are partitioning-deterministic, " +
      "floored mass bounded, authority differentiates") {
    import graft.operators.Relational
    val rows = Relational.q24PageRank(spark, sf).collect()
      .map(r => (r.getAs[String]("node_type"), r.getAs[Long]("node_id")) ->
        r.getAs[Long]("rank_e9")).toMap
    assert(rows.nonEmpty)
    val floor = Relational.PrScale * 15L / 100L
    // every rank >= the damping base; flooring only LOSES mass, so the
    // total never exceeds nodes × scale
    assert(rows.values.forall(_ >= floor))
    assert(rows.values.map(BigInt(_)).sum <=
      BigInt(rows.size) * Relational.PrScale)
    // the measure differentiates: not all nodes collapse to the base
    assert(rows.values.exists(_ > floor + Relational.PrScale / 100L))
    // reshuffle-proof: a skew-partitioned chain graph vs the same graph
    // shuffled — bit-identical iterates (integer arithmetic only)
    import spark.implicits._
    val chain = (0L until 300L).flatMap(i =>
      Seq((i, (i + 1) % 300L), ((i + 1) % 300L, i)))
      .toDF("src", "dst")
    def m(df: org.apache.spark.sql.DataFrame) =
      Relational.pageRank(df, 4).collect()
        .map(r => r.getAs[Long]("node") -> r.getAs[Long]("rank")).toMap
    assert(m(chain.repartition(1)) ==
      m(chain.repartition(7, org.apache.spark.sql.functions.col("dst"))))
  }

  test("q26 min-cost: every row achieves its part's true minimum among " +
      "qualified offers, only region suppliers appear, dims broadcast") {
    import org.apache.spark.sql.functions._
    import graft.operators.Relational
    import graft.Tables
    val out = Relational.q26MinCost(spark, sf).collect()
    assert(out.nonEmpty)
    // recompute the qualified offer set independently
    val euro = Tables.supplier(spark, sf)
      .join(Tables.nation(spark, sf), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.region(spark, sf).filter(col("r_name") === "EUROPE"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("s_suppkey"), col("s_name"))
    val offers = Tables.lineitem(spark, sf)
      .join(euro, col("l_suppkey") === col("s_suppkey"))
      .join(Tables.part(spark, sf).filter(col("p_size") < 10),
        col("l_partkey") === col("p_partkey"))
      .select(col("p_partkey").as("pk"), col("s_name").as("sn"),
        Tables.cents(col("l_extendedprice")).as("pc"))
      .collect()
    val minByPart = offers.groupBy(_.getAs[Long]("pk")).view
      .mapValues(_.map(_.getAs[Long]("pc")).min).toMap
    val euroNames = offers.map(_.getAs[String]("sn")).toSet
    out.foreach { r =>
      val pk = r.getAs[Long]("p_partkey")
      val priceC = math.round(r.getAs[Double]("min_price") * 100)
      assert(priceC == minByPart(pk),
        s"part $pk: $priceC is not the qualified min ${minByPart(pk)}")
      assert(euroNames.contains(r.getAs[String]("s_name")),
        "non-qualified supplier leaked")
    }
    // the dim chain broadcasts ahead of the fact scan
    val plan = Relational.q26MinCost(spark, sf)
      .queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(plan).length >= 2,
      s"dim chain not broadcast:\n$plan")
  }

  test("runtime bloom filter injects on the selective fact-fact join shape " +
      "(Catalyst's runtime row filtering engages at scale settings)") {
    import org.apache.spark.sql.functions._
    // the q3 shape: big probe side (lineitem) ⋈ selectively-filtered
    // creation side (orders). At 100 TB the bloom filter built from
    // the filtered side prunes probe rows BEFORE the shuffle — verify
    // the injection fires once broadcast is off and thresholds admit
    // the creation side, so the engine's join family inherits it
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.enabled").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.optimizer.runtime.bloomFilter.enabled", "true")
      conf.set("spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold", "500MB")
      // the production default (10GB) encodes "only bother at scale";
      // the test corpus is tiny, so admit it explicitly
      conf.set("spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold", "0")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val li = spark.read.parquet(s"$sf/lineitem.parquet")
        .select(col("l_orderkey"), col("l_quantity"))
      val ord = spark.read.parquet(s"$sf/orders.parquet")
        .filter(col("o_orderkey") % 100L === 0L)
        .select(col("o_orderkey"))
      val joined = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain") &&
        plan.contains("bloom_filter_agg"),
        s"runtime bloom filter did not inject:\n$plan")
      // and the filtered result is still exact
      val expect = li.join(ord.hint("broadcast"),
        col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expect)
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }

  test("AQE skew join splits a hot partition at runtime (skew=true) — the " +
      "automatic complement to q21's salting") {
    import org.apache.spark.sql.functions._
    // q21 salts a KNOWN hot key at plan time; AQE handles the hot key
    // nobody predicted by splitting the oversized partition when the
    // shuffle materializes. Verify the engine's settings admit that
    // re-plan: one key carries ~all left rows, thresholds lowered so
    // the toy corpus qualifies (production defaults encode "at scale").
    val conf = spark.conf
    val saved = Seq(
      "spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.autoBroadcastJoinThreshold").map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64KB")
      conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val left = spark.range(200000L)
        .select(when(col("id") % 10L =!= 0L, lit(0L))
          .otherwise(col("id")).as("k"),
          concat(lit("payload-padding-for-bytes-"), col("id")).as("pad"))
      val right = spark.range(2000L).select(col("id").as("k"),
        col("id").as("v"))
      val joined = left.join(right, "k")
      // execute THIS dataset's own physical plan (count() would build
      // a separate QueryExecution and leave this one un-executed) —
      // AQE finalizes the plan as the shuffle materializes
      val n = joined.queryExecution.toRdd.count()
      assert(n > 0L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not split the skewed partition:\n$finalPlan")
    } finally saved.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}
