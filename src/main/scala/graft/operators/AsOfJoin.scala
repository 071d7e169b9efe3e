package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.StructType

/** As-of join: for each left row, attach the latest right row with the
  * same key and right.ts <= left.ts (the standard event-stream /
  * point-in-time join Spark lacks as a built-in).
  *
  * Implementation is the union + running-last-value trick, NOT a range
  * join: tag both inputs, union them, and take `last(right payload)
  * ignoring nulls` over (key ORDER BY ts, side) rows unbounded-preceding
  * → current. Right rows sort before left rows at equal ts, so the match
  * is inclusive (right.ts <= left.ts).
  *
  * Scale rationale: a naive `left.ts >= right.ts` theta-join explodes to
  * O(|L|·|R|) per key before aggregation; this formulation is one
  * shuffle on the key + one linear window pass — O(|L|+|R|) rows moved,
  * partition-parallel across keys, skew handled by AQE. This is the plan
  * shape you want at 100 TB.
  */
object AsOfJoin {

  /** @param left      left (probe) rows
    * @param right     right (reference) rows
    * @param key       equi-join key column name (same name both sides)
    * @param ts        event-time column name (same name both sides)
    * @param rightCols right payload columns to attach (null when no
    *                  right row precedes the left row)
    */
  def asof(left: DataFrame, right: DataFrame, key: String, ts: String,
      rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.filterNot(c => c == key || c == ts)
    // The right payload travels as ONE struct column so a single
    // last(ignoreNulls) fills it — all payload fields are guaranteed to
    // come from the SAME right row even when two right rows tie on
    // (key, ts). Per-column fills could mix fields from different tied
    // rows, emitting a row that never existed.
    val payloadType = StructType(rightCols.map(c => right.schema(c)))
    val l = left.select(
      Seq(col(key), col(ts), lit(1).as("__side")) ++
        leftCols.map(col) :+
        lit(null).cast(payloadType).as("__rpay"): _*)
    // Null-key and null-ts right rows never match (SQL equi-join /
    // comparison semantics — the same rule the native
    // [[graft.plans.AsOfMergeJoin]] exec and Spark's stock
    // RewriteAsOfJoin apply). Without this filter a null-ts right row
    // sorts to the head of its window partition and its payload leaks
    // into every probe of that key; null-keyed rows would pair up in
    // the null window partition.
    val r = right.filter(col(key).isNotNull && col(ts).isNotNull).select(
      Seq(col(key), col(ts), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) :+
        struct(rightCols.map(col): _*).as("__rpay"): _*)
    // Ordering by the payload struct itself makes intra-tie order (and
    // therefore the run-to-run output) deterministic: among right rows
    // equal on (ts), the greatest payload struct wins the last(). Only
    // possible when the struct is orderable (e.g. no MapType fields) —
    // otherwise fall back to (ts, side) order, which still fills all
    // payload fields from ONE row, just with engine-chosen tie order.
    val tieBreak =
      if (org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(payloadType))
        Seq(col("__rpay").asc_nulls_first)
      else Seq.empty
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts) +: col("__side") +: tieBreak: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = l.unionByName(r)
      .withColumn("__rpay", last(col("__rpay"), ignoreNulls = true).over(w))
    filled.filter(col("__side") === 1)
      .select(Seq(col(key), col(ts)) ++ leftCols.map(col) ++
        rightCols.map(c => col(s"__rpay.$c").as(c)): _*)
  }
}
