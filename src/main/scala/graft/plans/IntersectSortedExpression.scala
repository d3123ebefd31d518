package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exact intersection SIZE of two SORTED-DISTINCT arrays as one linear
  * merge — the candidate-verification core of `Dedup.prefixJaccardPairs`
  * (and any operator holding `sort_array(collect_set(..))` sets).
  *
  * The composed form, `size(array_intersect(a, b))`, builds a hash set
  * of one side PER PAIR and probes every element of the other —
  * allocation plus hashing for every candidate pair; at sf0.1 the
  * jaccard_join verify step paid 6.3 s over 409k candidate pairs
  * almost entirely there. Both inputs are already sorted and distinct
  * (`sort_array(collect_set(..))`), so the count is a two-pointer merge
  * with zero allocation: same count, bit-exact (asserted against the
  * composed form in DedupSpec).
  *
  * Supports array<string> (UTF8 binary order — `sort_array`'s string
  * order) and array<bigint>. Elements must be non-null (collect_set
  * never emits null); a null ARRAY yields null like array_intersect.
  */
final case class IntersectSortedSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) => TypeCheckResult.TypeCheckSuccess
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"intersect_sorted_size expects two array<string> or two array<bigint>, got ($l, $r)")
  }

  private def isString: Boolean = left.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any =
    if (isString) IntersectSortedSize.countStrings(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else IntersectSortedSize.countLongs(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "countStrings" else "countLongs"
    defineCodeGen(ctx, ev, (a, b) => s"graft.plans.IntersectSortedSize.$fn($a, $b)")
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "intersect_sorted_size"
}

object IntersectSortedSize {

  def countStrings(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    var sa: UTF8String = if (na > 0) a.getUTF8String(0) else null
    var sb: UTF8String = if (nb > 0) b.getUTF8String(0) else null
    while (i < na && j < nb) {
      val c = sa.compareTo(sb)
      if (c == 0) { n += 1; i += 1; j += 1
        if (i < na) sa = a.getUTF8String(i)
        if (j < nb) sb = b.getUTF8String(j)
      } else if (c < 0) { i += 1; if (i < na) sa = a.getUTF8String(i) }
      else { j += 1; if (j < nb) sb = b.getUTF8String(j) }
    }
    n
  }

  def countLongs(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var n = 0
    while (i < na && j < nb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { n += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    n
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[IntersectSortedSize].getName, "intersect_sorted_size")
}
