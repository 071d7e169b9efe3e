package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Z-ORDER (Morton) curve value: bit-interleave two 16-bit dimension
  * keys into one 32-bit locality key. Sorting / range-partitioning a
  * table by `z` clusters rows that are close in BOTH dimensions into
  * the same files, so parquet row-group min/max stats become selective
  * for 2-D box predicates — the multi-dimensional data-layout trick a
  * single-column sort cannot provide (a scan ordered by dimension A
  * skips nothing for a filter on dimension B).
  *
  * This is a LAYOUT primitive, not a lookup structure: at 100 TB the
  * pattern is `df.repartitionByRange(n, z).sortWithinPartitions(z)`
  * on write, then every reader with a box filter on the interleaved
  * dimensions prunes most files from the parquet footer stats alone
  * (measured in the layout spec). 16 bits per dimension is the
  * deliberate resolution: file-level clustering needs only enough z
  * granularity to separate files, and 16+16 keeps every intermediate
  * positive in signed 64-bit so the SAME magic-number spread steps run
  * exactly in DuckDB SQL (the oracle) and in JVM longs.
  *
  * Each dimension is masked to its low 16 bits (`x & 0xFFFF`) — callers
  * bucket real-valued or wide-domain keys down to ≤ 65536 buckets
  * first, which is also the right layout resolution.
  */
object ZOrder {

  /** z = interleave(lo16(a), lo16(b)); bit 2i = bit i of a, bit 2i+1 =
    * bit i of b. Total 32 bits, always non-negative. */
  def interleave16(a: Long, b: Long): Long =
    spread16(a & 0xffffL) | (spread16(b & 0xffffL) << 1)

  /** Classic magic-number bit spread: 16 data bits spaced out to the
    * even bit positions of a 32-bit value. Every intermediate is
    * < 2^32, so the identical arithmetic is valid BIGINT math in SQL. */
  @inline private def spread16(x0: Long): Long = {
    var x = x0
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }
}

/** (bigint, bigint) → bigint Morton code — codegen'd single static
  * call; see [[ZOrder.interleave16]]. */
case class ZOrder16Expr(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "zorder16"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (bigint, bigint), got (${l.sql}, ${r.sql})")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    ZOrder.interleave16(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ZOrder.interleave16($a, $b);")

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): ZOrder16Expr = copy(left = l, right = r)
}
