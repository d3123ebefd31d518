package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Morton (Z-order) code: bit-interleave of two non-negative integer
  * dimensions — `bits` low bits each, dimension `a` on even positions,
  * `b` on odd. Sorting by the code gives a space-filling-curve layout
  * in which file-level min/max ranges stay narrow on BOTH dimensions
  * at once, where a lexicographic sort keeps only its leading column
  * prunable (the Delta/Iceberg `ZORDER BY` trick; measured in
  * LayoutSpec: the prunable-file fraction for a predicate on the
  * SECOND dimension). One codegen'd bit loop per row, shuffle-free;
  * the layout itself is `repartitionByRange + sortWithinPartitions`
  * on the code ([[graft.operators.Layout.zorderLayout]]).
  *
  * Values are masked to `bits` (callers bucket/hash wider domains
  * first); `bits ≤ 31` keeps the code inside a positive long.
  */
final case class MortonCode(left: Expression, right: Expression, bits: Int)
  extends BinaryExpression {

  require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"morton_code expects (bigint, bigint), got ($l, $r)")
  }

  override protected def nullSafeEval(a: Any, b: Any): Any =
    MortonCode.interleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.MortonCode.interleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "morton_code"
}

object MortonCode {

  /** Static entry the generated code calls (named for the
    * static-forwarder reason documented at [[SnakeCase.convert]]).
    */
  def interleave(a: Long, b: Long, bits: Int): Long = {
    var r = 0L
    var i = 0
    while (i < bits) {
      r |= ((a >> i) & 1L) << (2 * i)
      r |= ((b >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    r
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[MortonCode].getName, "morton_code")
}
