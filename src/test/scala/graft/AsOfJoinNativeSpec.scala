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
}
