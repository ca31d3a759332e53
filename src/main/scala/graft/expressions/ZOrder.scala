package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, expression}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Z-order (Morton) cluster key: the locality-preserving interleave behind
  * two-dimensional data skipping (Delta `OPTIMIZE ZORDER BY`, Iceberg
  * sort-order z-curves). Sorting by this key clusters rows so that every
  * run of consecutive rows covers a small RECTANGLE in (a, b) space — files
  * cut from the sorted run then carry tight per-file min/max on BOTH
  * columns, and [[graft.sources.Snapshot.readWhere]]'s ordinary stat prune
  * skips files for predicates on EITHER dimension. A single-column sort
  * only ever prunes its own column.
  *
  * Output is a 16-byte binary whose unsigned lexicographic order IS the
  * z-order of the full 64+64-bit inputs (sign bits flipped so signed Long
  * order is preserved; `a` takes the more significant bit of each pair).
  * Full-width interleave means no range normalization, no precomputed
  * quantiles, and no degenerate keys when a dimension spans a small range —
  * the reason the key is binary rather than a truncated 64-bit Long. */
object ZOrder {

  /** zorder2(a, b): array<byte>(16) Morton key of two longs. */
  case class ZOrder2(left: Expression, right: Expression)
      extends BinaryExpression {

    override def dataType: DataType = BinaryType
    override def checkInputDataTypes()
        : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
      val ok = Seq(left, right).forall(_.dataType == LongType)
      if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"zorder2 requires (bigint, bigint), got ${left.dataType}, ${right.dataType}")
    }

    override def nullSafeEval(a: Any, b: Any): Any =
      ZOrder2.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) =>
        s"${ev.value} = graft.expressions.Kernels.zorder2($a, $b);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  object ZOrder2 {
    /** Spread the low 32 bits of `x` so bit j lands at bit 2j. */
    private def spread(x0: Long): Long = {
      var x = x0 & 0xFFFFFFFFL
      x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
      x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
      x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
      x = (x | (x << 2)) & 0x3333333333333333L
      x = (x | (x << 1)) & 0x5555555555555555L
      x
    }

    def compute(a: Long, b: Long): Array[Byte] = {
      // flip sign bits: unsigned byte order == signed Long order per dim
      val ua = a ^ Long.MinValue
      val ub = b ^ Long.MinValue
      val hi = (spread(ua >>> 32) << 1) | spread(ub >>> 32)
      val lo = (spread(ua) << 1) | spread(ub)
      val out = new Array[Byte](16)
      var i = 0
      while (i < 8) {
        out(i) = (hi >>> (56 - 8 * i)).toByte
        out(8 + i) = (lo >>> (56 - 8 * i)).toByte
        i += 1
      }
      out
    }
  }

  def zorder2(a: Column, b: Column): Column =
    column(ZOrder2(expression(a), expression(b)))
}
