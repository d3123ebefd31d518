package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert curve index: maps a 2-D point to its position along the
  * order-`bits` Hilbert curve — the space-filling layout key with
  * strictly better locality than [[MortonCode]]'s Z-order (consecutive
  * Hilbert positions are ALWAYS Manhattan-adjacent cells; the Z-curve
  * makes 2^k-long diagonal jumps at quadrant seams). Delta Lake and
  * Iceberg ship it as the successor to ZORDER BY for exactly that
  * reason: tighter per-file min/max envelopes on both dimensions →
  * more files pruned per range predicate. Same usage as the Morton
  * twin: sort/range-partition by the code
  * ([[graft.operators.Layout.hilbertLayout]]), one codegen'd bit loop
  * per row, shuffle-free.
  *
  * The encoding is the classic quadrant-rotation walk (Hilbert 1891 via
  * the iterative form): from the top bit down, accumulate the quadrant
  * index `(3·rx) XOR ry` scaled by the quadrant area, then
  * rotate/reflect the remaining low bits into the sub-quadrant's frame.
  * Inputs are masked to `bits` (callers bucket/hash wider domains
  * first); `bits ≤ 31` keeps the code inside a positive long.
  */
final case class HilbertCode(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"hilbert_code expects (bigint, bigint), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HilbertCode.encode(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.HilbertCode.encode($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "hilbert_code"
}

object HilbertCode {

  /** Static entry the generated code calls (named for the
    * static-forwarder reason documented at [[SnakeCase.convert]]).
    */
  def encode(aIn: Long, bIn: Long, bits: Int): Long = {
    val mask = (1L << bits) - 1
    var x = aIn & mask
    var y = bIn & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      // rotate the low bits into the sub-quadrant frame
      if (ry == 0) {
        if (rx == 1) {
          x = s - 1 - x
          y = s - 1 - y
        }
        val t = x & (s - 1)
        x = y & (s - 1)
        y = t
      } else {
        x &= (s - 1)
        y &= (s - 1)
      }
      s >>= 1
    }
    d
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[HilbertCode].getName, "hilbert_code")
}
