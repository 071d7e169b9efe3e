package graft.functions

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
  * The hot path is allocation-free: once a partial sketch fills, the
  * overwhelming majority of rows lose a single binary compare against
  * the cached kth value and are rejected without copying the input
  * (UTF8Strings from `child.eval` are buffer-backed and only cloned
  * when they actually enter the sketch). The buffer's ordering is
  * UTF8String's byte-wise compare — identical to string order for the
  * ASCII hex digests staged here and to the oracle's VARCHAR sort.
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
  extends TypedImperativeAggregate[java.util.TreeSet[UTF8String]]
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

  override def createAggregationBuffer(): java.util.TreeSet[UTF8String] =
    new java.util.TreeSet[UTF8String]()

  /** `v` may be backed by a reused row buffer: compare first (free),
    * clone only on actual insertion. `owned` skips the clone for
    * values this aggregate already owns (merge path). */
  private def add(b: java.util.TreeSet[UTF8String], v: UTF8String,
      owned: Boolean): Unit =
    if (b.size < k) {
      b.add(if (owned) v else v.clone()): Unit
    } else if (v.compareTo(b.last) < 0 &&
        b.add(if (owned) v else v.clone())) {
      b.pollLast(): Unit
    }

  override def update(b: java.util.TreeSet[UTF8String],
      input: InternalRow): java.util.TreeSet[UTF8String] = {
    val v = child.eval(input)
    if (v != null) add(b, v.asInstanceOf[UTF8String], owned = false)
    b
  }

  override def merge(b: java.util.TreeSet[UTF8String],
      o: java.util.TreeSet[UTF8String]): java.util.TreeSet[UTF8String] = {
    val it = o.iterator()
    while (it.hasNext) add(b, it.next(), owned = true)
    b
  }

  override def eval(b: java.util.TreeSet[UTF8String]): Any = {
    val out = new Array[Any](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(b: java.util.TreeSet[UTF8String]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val out = new java.io.DataOutputStream(bos)
    out.writeInt(b.size)
    val it = b.iterator()
    while (it.hasNext) {
      val bytes = it.next().getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[UTF8String] = {
    val in = new java.io.DataInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val b = new java.util.TreeSet[UTF8String]()
    val n = in.readInt()
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val buf = new Array[Byte](len)
      in.readFully(buf)
      b.add(UTF8String.fromBytes(buf)): Unit
      i += 1
    }
    b
  }

  override def withNewMutableAggBufferOffset(offset: Int): KmvAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): KmvAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): KmvAggExpr =
    copy(child = c)
}
