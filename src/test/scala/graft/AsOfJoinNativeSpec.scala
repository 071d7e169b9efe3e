package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.AsOfJoin
import graft.plans.AsOfMergeJoin

/** The native Catalyst as-of join ([[graft.plans.AsOfMergeJoin]]) must
  * be a drop-in for the composed union+window form ([[AsOfJoin.asof]]):
  * same rows, same tie rule, same null semantics — while actually
  * planning the custom `AsOfMergeJoinExec` node (asserted on the
  * executed-plan text, with both sides exchanged on the key).
  */
class AsOfJoinNativeSpec extends SparkSpecBase {

  private def canon(df: DataFrame): Array[String] = {
    val cols = df.columns.sorted
    df.select(cols.map(col): _*).collect()
      .map(_.toString).sorted
  }

  private def assertSame(a: DataFrame, b: DataFrame): Unit = {
    val (ca, cb) = (canon(a), canon(b))
    assert(ca.length == cb.length, s"row count ${ca.length} != ${cb.length}")
    assert(ca.sameElements(cb),
      s"first diff: ${ca.zip(cb).find { case (x, y) => x != y }}")
  }

  private def eventsDf = Tables.events(spark, sf)

  private def e4Inputs = {
    val ev = eventsDf
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"),
        col("event_id").as("purchase_id"),
        Tables.cents(col("value")).as("purchase_cents"))
    (clicks, purchases)
  }

  test("native as-of equals the composed form on the real events corpus " +
      "(self-source: both sides from one scan)") {
    val (clicks, purchases) = e4Inputs
    val cols = Seq("purchase_id", "purchase_cents")
    assertSame(
      AsOfMergeJoin.asof(clicks, purchases, "user_id", "ts", cols),
      AsOfJoin.asof(clicks, purchases, "user_id", "ts", cols))
  }

  test("plans the custom exec with key-clustered exchanges on both sides") {
    val (clicks, purchases) = e4Inputs
    val out = AsOfMergeJoin.asof(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_cents"))
    val plan = planOf(out)
    assert(plan.contains("AsOfMergeJoin"), s"custom exec missing:\n$plan")
    val exchanges =
      "hashpartitioning\\(user_id".r.findAllIn(plan.toLowerCase).size +
        "hashpartitioning\\(__rk_user_id".r.findAllIn(plan.toLowerCase).size
    assert(exchanges >= 2, s"expected both sides keyed on user_id:\n$plan")
  }

  test("edge semantics: inclusive match, no-predecessor null, last-wins tie") {
    import spark.implicits._
    val left = Seq(
      (1L, 10L, "l-a"),   // matches r at ts=10 (inclusive)
      (1L, 5L, "l-b"),    // no right row at or before 5 -> null
      (2L, 100L, "l-c"),  // two right rows tie at ts=50: greatest payload wins
      (3L, 7L, "l-d")     // key with no right rows at all
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (1L, 10L, "r-10"),
      (1L, 9L, "r-9"),
      (2L, 50L, "r-tie-a"),
      (2L, 50L, "r-tie-b")
    ).toDF("k", "ts", "rv")

    val native = AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(native("l-a") == Some("r-10"))
    assert(native("l-b") == None)
    assert(native("l-c") == Some("r-tie-b")) // greatest payload among ties
    assert(native("l-d") == None)

    val composed = AsOfJoin.asof(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(native == composed)
  }

  test("property: equals the composed form on adversarial random inputs " +
      "(hot keys, ts ties, null payloads, empty sides)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 4) {
      val nKeys = 1 + trial * 3
      val lRows = (0 until 400).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong, i.toLong)
      }
      val rRows = (0 until 300).map { i =>
        (rnd.nextInt(nKeys).toLong, rnd.nextInt(40).toLong,
          if (rnd.nextInt(10) == 0) None else Some(s"p$i"))
      }
      val left = lRows.toDF("k", "ts", "lid").repartition(5)
      val right = rRows.toDF("k", "ts", "pay").repartition(3)
      assertSame(
        AsOfMergeJoin.asof(left, right, "k", "ts", Seq("pay")),
        AsOfJoin.asof(left, right, "k", "ts", Seq("pay")))
    }
    // one side empty
    val left = Seq((1L, 1L, 1L)).toDF("k", "ts", "lid")
    val right = Seq.empty[(Long, Long, String)].toDF("k", "ts", "pay")
    assertSame(
      AsOfMergeJoin.asof(left, right, "k", "ts", Seq("pay")),
      AsOfJoin.asof(left, right, "k", "ts", Seq("pay")))
  }

  test("null ts semantics: a null probe time matches nothing; null right ts " +
      "rows never become candidates (SQL comparison semantics)") {
    import spark.implicits._
    val left = Seq((1L, Some(10L), "probe"), (1L, None, "null-probe"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, None, "r-null"), (1L, Some(5L), "r-5"))
      .toDF("k", "ts", "rv")
    val got = AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(got("probe") == Some("r-5"), "null right ts leaked into a match")
    assert(got("null-probe") == None, "null probe time matched")
  }

  test("null join keys are unmatchable on either side — native, composed, and " +
      "Spark's stock merge_asof rewrite agree (SQL EqualTo semantics)") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin => SparkAsOfJoin}
    import org.apache.spark.sql.catalyst.plans.{AsOfJoinDirection, LeftOuter}
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import spark.implicits._
    val left = Seq(
      (Some(1L), 10L, "match"),       // normal: matches r1@5
      (None, 10L, "null-key-probe"),  // null key: must NOT take r-null's payload
      (Some(2L), 10L, "no-match")     // key 2 has only a later right row
    ).toDF("k", "ts", "lv")
    val right = Seq(
      (Some(1L), 5L, "r1"),
      (None, 5L, "r-null"),   // null-keyed right row: never a candidate
      (Some(2L), 20L, "r2")
    ).toDF("k", "ts", "rv")

    val native = AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(native("match") == Some("r1"))
    assert(native("null-key-probe") == None,
      "null-keyed probe matched a null-keyed right row")
    assert(native("no-match") == None)

    val composed = AsOfJoin.asof(left, right, "k", "ts", Seq("rv"))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(composed == native, "composed form diverges on null keys")

    // intercepted merge_asof vs Spark's stock RewriteAsOfJoin on the
    // same null-keyed inputs: the swap must stay invisible
    AsOfMergeJoin.install(spark)
    val lp = GraftSqlBridge.analyzed(left)
    val rp = GraftSqlBridge.analyzed(right)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    val node = SparkAsOfJoin(
      lp, rp, attr(lp, "ts"), attr(rp, "ts"),
      Some(EqualTo(attr(lp, "k"), attr(rp, "k"))), LeftOuter,
      tolerance = None, allowExactMatches = true,
      direction = AsOfJoinDirection("backward"))
    val stock = GraftSqlBridge.ofRows(spark, node)
    val routed = GraftSqlBridge.ofRows(spark,
      AsOfMergeJoin.InterceptSparkAsOfJoin(node))
    assert(planOf(routed).contains("AsOfMergeJoin"))
    val (a, b) = (routed.collect().map(_.toString).sorted,
      stock.collect().map(_.toString).sorted)
    assert(a.sameElements(b),
      s"intercepted diverges from stock on null keys: ${a.zip(b).find { case (x, y) => x != y }}")
  }

  test("mixed ts types are refused up front (DATE days vs TIMESTAMP micros " +
      "would silently miscompare)") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a")).toDF("k", "ts", "lv")
    val right = Seq((1L, 5, "r")).toDF("k", "ts", "rv") // INT ts vs LONG
    val e = intercept[IllegalArgumentException] {
      AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"))
    }
    assert(e.getMessage.contains("ts type mismatch"), e.getMessage)
  }

  test("tolerance: latest-outside-window nulls out; equals composed+post-filter " +
      "on random inputs") {
    import spark.implicits._
    val left = Seq((1L, 100L, "near"), (1L, 200L, "far"), (1L, 40L, "none"))
      .toDF("k", "ts", "lv")
    val right = Seq((1L, 95L, "r95")).toDF("k", "ts", "rv")
    val got = AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"),
      tolerance = Some(10L))
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(got("near") == Some("r95"))  // diff 5 <= 10
    assert(got("far") == None)          // latest is 105 away
    assert(got("none") == None)         // nothing precedes

    val rnd = new scala.util.Random(7)
    val l = (0 until 300).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, i.toLong)).toDF("k", "ts", "lid")
    val r = (0 until 200).map(i =>
      (rnd.nextInt(5).toLong, rnd.nextInt(50).toLong, s"p$i")).toDF("k", "ts", "pay")
    val tol = 4L
    val native = AsOfMergeJoin.asof(l, r, "k", "ts", Seq("pay"),
      tolerance = Some(tol))
    // reference: unbounded composed match, then null the payload when
    // the matched row's ts is outside the window (backward
    // monotonicity: older rows are farther, so filter ≡ tolerance)
    val composed = AsOfJoin.asof(l,
      r.withColumn("pay_ts", struct(col("pay"), col("ts").as("rts"))),
      "k", "ts", Seq("pay_ts"))
      .withColumn("pay",
        when(col("ts") - col("pay_ts.rts") <= tol, col("pay_ts.pay")))
      .drop("pay_ts")
    assertSame(native, composed)
  }

  test("forward direction: first right at or after the probe, ties to greatest " +
      "payload; equals composed on negated ts") {
    import spark.implicits._
    val left = Seq((1L, 10L, "a"), (1L, 11L, "b"), (1L, 50L, "c")).toDF("k", "ts", "lv")
    val right = Seq((1L, 11L, "r11-x"), (1L, 11L, "r11-y"), (1L, 20L, "r20"))
      .toDF("k", "ts", "rv")
    val got = AsOfMergeJoin.asof(left, right, "k", "ts", Seq("rv"),
      forward = true)
      .select("lv", "rv").as[(String, Option[String])].collect().toMap
    assert(got("a") == Some("r11-y")) // first qualifying ts=11, greatest payload
    assert(got("b") == Some("r11-y")) // inclusive
    assert(got("c") == None)          // nothing at or after 50

    val rnd = new scala.util.Random(11)
    val l = (0 until 300).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, i.toLong)).toDF("k", "ts", "lid")
    val r = (0 until 200).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(40).toLong, s"p$i")).toDF("k", "ts", "pay")
    val fwd = AsOfMergeJoin.asof(l, r, "k", "ts", Seq("pay"), forward = true)
    // forward ≡ backward on negated ts (ties: both take greatest payload)
    val neg = AsOfJoin.asof(
      l.withColumn("ts", -col("ts")), r.withColumn("ts", -col("ts")),
      "k", "ts", Seq("pay"))
      .withColumn("ts", -col("ts"))
    assertSame(fwd, neg)
  }

  test("InterceptSparkAsOfJoin routes Spark's merge_asof node to the native exec, " +
      "matching the stock rewrite; non-matching shapes fall through") {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.plans.logical.{AsOfJoin => SparkAsOfJoin}
    import org.apache.spark.sql.catalyst.plans.{AsOfJoinDirection, LeftOuter}
    import org.apache.spark.sql.catalyst.expressions.EqualTo
    import spark.implicits._

    // extensions wire the rule into session building
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext)
    assert(GraftSqlBridge.postHocResolutionRules(ext, spark)
      .contains(AsOfMergeJoin.InterceptSparkAsOfJoin))
    // an extensions-built session gets rule AND strategy; this session
    // installs the strategy the lazy way
    AsOfMergeJoin.install(spark)

    val rnd = new scala.util.Random(3)
    // tie-free ts per (key, ts) so the stock rewrite's arbitrary-tie
    // min_by and the native greatest-payload rule cannot diverge
    val l = (0 until 200).map(i =>
      (rnd.nextInt(6).toLong, i.toLong * 3 + rnd.nextInt(3), i.toLong))
      .toDF("k", "ts", "lid")
    val r = (0 until 150).map(i =>
      (rnd.nextInt(6).toLong, i.toLong * 4 + rnd.nextInt(4), s"p$i"))
      .distinct.toDF("k", "ts", "pay")
      .groupBy("k", "ts").agg(first("pay").as("pay")) // unique (k, ts)

    val lp = GraftSqlBridge.analyzed(l)
    val rp = GraftSqlBridge.analyzed(r)
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan,
        n: String) = p.output.find(_.name == n).get
    def node(direction: String) = SparkAsOfJoin(
      lp, rp, attr(lp, "ts"), attr(rp, "ts"),
      Some(EqualTo(attr(lp, "k"), attr(rp, "k"))), LeftOuter,
      tolerance = None, allowExactMatches = true,
      direction = AsOfJoinDirection(direction))

    for (dir <- Seq("backward", "forward")) {
      val stock = GraftSqlBridge.ofRows(spark, node(dir)) // normal rewrite
      assert(!planOf(stock).contains("AsOfMergeJoin"))
      val routed = GraftSqlBridge.ofRows(spark,
        AsOfMergeJoin.InterceptSparkAsOfJoin(node(dir)))
      assert(planOf(routed).contains("AsOfMergeJoin"),
        s"$dir did not route to the native exec:\n${planOf(routed)}")
      // both outputs carry duplicate column NAMES (merge_asof keeps the
      // right key/ts) in the same positions — compare rows positionally
      val (a, b) = (routed.collect().map(_.toString).sorted,
        stock.collect().map(_.toString).sorted)
      assert(a.sameElements(b),
        s"$dir diverges: ${a.zip(b).find { case (x, y) => x != y }}")
    }

    // nearest direction (an Or condition) must fall through untouched
    val nearest = AsOfMergeJoin.InterceptSparkAsOfJoin(node("nearest"))
    assert(nearest.isInstanceOf[SparkAsOfJoin], "nearest should fall through")
  }

  test("forward + tolerance on the real corpus shape runs and bounds the gap") {
    val (clicks, purchases) = e4Inputs
    val out = AsOfMergeJoin.asof(clicks, purchases, "user_id", "ts",
      Seq("purchase_id", "purchase_cents"),
      tolerance = Some(3600L * 1000000L), forward = true)
    val rows = out.select(col("ts").cast("long").as("lts"),
      col("purchase_id")).collect()
    assert(rows.nonEmpty && rows.exists(!_.isNullAt(1)),
      "no forward matches at all — fixture degenerate")
  }
}
