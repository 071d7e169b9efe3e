package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Count-Min Sketch as a native `TypedImperativeAggregate` — the
  * mergeable-sketch tier of frequency estimation (heavy hitters,
  * join-skew detection, stream×batch frequency joins) that replaces a
  * corpus-sized exact groupBy with CONSTANT-size state.
  *
  * This exercises the one Catalyst extension surface the engine had
  * not yet used natively: a custom imperative aggregate with real
  * partial aggregation — per-partition `update`, serialized-buffer
  * shuffle, `merge` on the reduce side. The sketch contract is why it
  * scales: state is `depth × width` longs (a few KB) regardless of
  * corpus size, partial merge is elementwise addition (associative +
  * commutative ⇒ the result is bit-identical under ANY partitioning,
  * task order, or AQE re-plan — the engine's determinism contract,
  * which randomized sketches like KLL would violate), and the same
  * buffer is the streaming-state shape a continuous twin would keep.
  *
  * The aggregate does NOT hash: its child is a staged `array<bigint>`
  * of `depth` row-hashes (md5-prefix folds, the x6/d2 family), so the
  * hash definition lives in ONE place, inlined identically into the
  * Spark plan and the DuckDB oracle. `update` reduces each hash mod
  * `width` and adds the row's WEIGHT (`weight`, default literal 1 —
  * the per-occurrence form); `eval` returns the flat `depth·width`
  * counter array. Estimates are then plain column arithmetic:
  * `min_j counters[j·width + h_j mod width]` — CMS's one-sided
  * guarantee (estimate ≥ true count) is asserted in the spec and
  * visible per-row in the q26 output.
  *
  * The weight child (r18, VERDICT r17 #5) exists so an ingest path
  * can pre-aggregate to (key, count) and feed the sketch one weighted
  * update per DISTINCT key instead of one per occurrence — the
  * counters are integer sums, so Σ over occurrences ≡ one += count:
  * the sketch is bit-identical by additive commutativity (spec-pinned
  * in HashKernelSpec). The exactly-once ingestion contract is
  * unchanged: a redelivered (key, count) row still double-counts,
  * exactly as a redelivered occurrence did — the streaming twin
  * ([[graft.streaming.StreamOps.cmsStream]]) keeps its per-occurrence
  * form behind the same dedup/ack front it always documented.
  *
  * Null child rows are skipped (SQL aggregate convention); a null
  * weight on a non-null child row is a contract violation and fails
  * loudly (silently skipping would under-count without trace).
  */
case class CmsAggExpr(
    child: Expression,
    depth: Int,
    width: Int,
    weight: Expression = Literal(1L),
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with BinaryLike[Expression] {

  require(depth >= 1 && width >= 2, "cms requires depth >= 1, width >= 2")

  override def left: Expression = child
  override def right: Expression = weight

  override def checkInputDataTypes(): TypeCheckResult =
    (child.dataType, weight.dataType) match {
      case (ArrayType(LongType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (t, w) => TypeCheckResult.TypeCheckFailure(
        s"cms_sketch requires array<bigint> of $depth row-hashes and a " +
          s"bigint weight, got ${t.sql} / ${w.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "cms_sketch"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](depth * width)

  override def update(b: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val hs = v.asInstanceOf[ArrayData]
      // fail loudly on a short hash array: updating only SOME sketch
      // rows would silently break the CMS one-sided guarantee
      // (estimate >= true count) the spec and x26 assert
      if (hs.numElements() < depth)
        throw new IllegalArgumentException(
          s"cms_sketch: row-hash array has ${hs.numElements()} elements, " +
            s"need $depth (one per sketch row)")
      val wv = weight.eval(input)
      if (wv == null)
        throw new IllegalArgumentException(
          "cms_sketch: null weight for a non-null row-hash array — a " +
            "weighted ingest row must carry its count")
      val n = wv.asInstanceOf[Long]
      var j = 0
      while (j < depth) {
        if (!hs.isNullAt(j)) {
          // row-hashes are md5-prefix folds: always >= 0; floorMod
          // keeps adversarial negative inputs in range anyway
          val bucket = java.lang.Math.floorMod(hs.getLong(j), width.toLong)
          b(j * width + bucket.toInt) += n
        }
        j += 1
      }
    }
    b
  }

  override def merge(b: Array[Long], o: Array[Long]): Array[Long] = {
    var i = 0
    while (i < b.length) { b(i) += o(i); i += 1 }
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

  override def withNewMutableAggBufferOffset(offset: Int): CmsAggExpr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): CmsAggExpr =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmsAggExpr =
    copy(child = newLeft, weight = newRight)
}
