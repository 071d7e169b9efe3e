package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** HyperLogLog registers as a native `TypedImperativeAggregate` — the
  * mergeable-sketch tier of DISTINCT counting (vocabulary size per
  * source/day/shard at 100 TB, where an exact count(distinct) shuffles
  * the full key set). Companion to [[CmsAggExpr]] (frequency): together
  * they are the two sketches every corpus-stats pipeline carries.
  *
  * State is `m` register maxima (one long each); `update` folds one
  * hashed value, `merge` is ELEMENTWISE MAX — associative, commutative
  * and IDEMPOTENT, so beyond the usual any-partitioning determinism the
  * sketch is duplicate-INSENSITIVE: re-delivered rows cannot change it,
  * which makes the streaming twin exactly-once-free by algebra (unlike
  * CMS, whose sum-merge needs dedup in front).
  *
  * The aggregate does NOT hash: its child is a staged 60-bit row hash
  * (a 15-hex-char md5 prefix fold, the x6/x26 family), so the hash
  * definition lives in ONE place, inlined identically into the Spark
  * plan and the DuckDB oracle. Register index is the low
  * log2(m) bits (`h mod m`); the rank is the leading-zero count of the
  * remaining `60 − log2(m)`-bit field plus one (`w = 0` maps past the
  * field width), exactly the `55 − length(bin(w))` arithmetic both
  * engines state for m = 64. `eval` returns the m register maxima
  * (0 for untouched registers); the harmonic-mean estimate is then
  * plain column arithmetic over exact powers of two.
  *
  * Null child rows are skipped (SQL aggregate convention). Negative
  * hashes (impossible for md5-prefix folds) fail loudly rather than
  * silently folding into wrong registers.
  */
case class HllAggExpr(
    child: Expression,
    m: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  require(m >= 2 && (m & (m - 1)) == 0, "hll requires a power-of-two register count")

  /** Width of the rank field: 60 hash bits minus the index bits. */
  private val idxBits = java.lang.Integer.numberOfTrailingZeros(m)
  private val wBits = 60 - idxBits

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case LongType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"hll_sketch requires a BIGINT row hash, got ${t.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "hll_sketch"

  override def createAggregationBuffer(): Array[Long] = new Array[Long](m)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      if (h < 0)
        throw new IllegalArgumentException(
          s"hll_sketch: negative row hash $h (expected a 60-bit md5-prefix fold)")
      val idx = (h % m).toInt
      val w = h >>> idxBits
      // rank = leading zeros of the wBits-wide field + 1; w = 0 ⇒ the
      // whole field is zero ⇒ wBits + 1 (the 55 − length(bin(w)) form)
      val rank =
        if (w == 0L) wBits + 1
        else wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rank > b(idx)) b(idx) = rank.toLong
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { if (o(i) > b(i)) b(i) = o(i); i += 1 }
    b
  }

  override def eval(b: Array[Long]): Any = new GenericArrayData(b)

  override def serialize(b: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(b.length * 8)
    bb.asLongBuffer().put(b)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): HllAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(c: Expression): HllAggExpr =
    copy(child = c)
}
