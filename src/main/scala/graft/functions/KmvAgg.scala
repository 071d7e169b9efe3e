package graft.functions

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** K-Minimum-Values distinct sketch as a native
  * `TypedImperativeAggregate` — the mergeable-sketch tier of DISTINCT
  * estimation that, unlike HLL ([[HllAggExpr]]), supports SET
  * OPERATIONS: two KMV sketches union into the KMV of the union, so
  * Jaccard and intersection cardinalities between groups fall out of
  * sketch-sized math (the theta-sketch trick) — the cross-source
  * overlap question x36's HLL cannot answer.
  *
  * State is the k lexicographically smallest DISTINCT values of the
  * child (a bounded sorted set: at most k strings, ~k·32 bytes for md5
  * hex), independent of group size. k-min-of-distinct is associative,
  * commutative and duplicate-insensitive, so the result is
  * bit-identical under any partitioning, task order, or AQE re-plan —
  * the engine's determinism contract; nothing here is randomized,
  * because the "random draw" is the md5 the caller staged (the
  * x6/d2 hash-as-uniform-draw discipline), identical in the DuckDB
  * oracle.
  *
  * The aggregate does NOT hash: its child is the staged md5-hex
  * string, so the hash definition lives in ONE place. `eval` returns
  * the ascending `array<string>` of the ≤k survivors. Estimation
  * (union size from the kth value, shared-in-union counts) is plain
  * column arithmetic downstream, restated verbatim by the oracle.
  * Null child rows are skipped (SQL aggregate convention).
  */
case class KmvAggExpr(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[String]]
  with UnaryLike[Expression] {

  require(k >= 1, "kmv_sketch requires k >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"kmv_sketch requires a staged hash string, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "kmv_sketch"

  override def createAggregationBuffer(): java.util.TreeSet[String] =
    new java.util.TreeSet[String]()

  private def add(b: java.util.TreeSet[String], v: String): Unit =
    if (b.size < k) { b.add(v): Unit }
    else if (v.compareTo(b.last) < 0 && b.add(v)) { b.pollLast(): Unit }

  override def update(b: java.util.TreeSet[String],
      input: InternalRow): java.util.TreeSet[String] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[UTF8String].toString)
    b
  }

  override def merge(b: java.util.TreeSet[String],
      o: java.util.TreeSet[String]): java.util.TreeSet[String] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next())
    b
  }

  override def eval(b: java.util.TreeSet[String]): Any = {
    val out = new Array[Any](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[String]): Array[Byte] = {
    val sb = new StringBuilder
    val it = b.iterator()
    while (it.hasNext) { sb.append(it.next()); sb.append('\n') }
    sb.toString.getBytes(StandardCharsets.UTF_8)
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[String] = {
    val b = new java.util.TreeSet[String]()
    val s = new String(bytes, StandardCharsets.UTF_8)
    if (s.nonEmpty) s.split('\n').foreach(v => if (v.nonEmpty) b.add(v))
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvAggExpr =
    copy(child = c)
}
