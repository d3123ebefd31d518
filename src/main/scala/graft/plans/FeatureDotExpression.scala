package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native hashed-feature dot product against a driver weight array —
  * the per-document scorer of `QualityClassifier`'s perceptron loop.
  *
  * The composed form folded `aggregate(fs, 0L, acc + cnt ·
  * element_at(wLit, bucket + 1))` with the weights as a 4097-element
  * array LITERAL: the aggregate HOF is CodegenFallback (one boxed
  * lambda eval per feature per doc per epoch — and ×10 snapshot
  * columns in the datamap projection), and the big literal rides the
  * expression tree through analysis on every epoch's fresh plan. Here
  * the weights are a code-generated reference object and the fold is
  * one primitive loop. Same int64 left-fold order, bit-identical
  * scores (asserted against the HOF form in QualityClassifierSpec).
  *
  * Input: array<struct<bucket:int, cnt:bigint>>; weights index is
  * `bucket` 0-based (the composed form's element_at(w, bucket+1)).
  * A bucket outside [0, len) throws like ANSI element_at.
  */
final case class FeatureDot(child: Expression, weights: Seq[Long]) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StructType(fs), _)
        if fs.length == 2 && fs(0).dataType == IntegerType && fs(1).dataType == LongType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"feature_dot expects array<struct<int,bigint>>, got $t")
  }

  @transient private lazy val wArr: Array[Long] = weights.toArray

  override protected def nullSafeEval(input: Any): Any =
    FeatureDot.score(input.asInstanceOf[ArrayData], wArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("featureWeights", wArr, "long[]")
    defineCodeGen(ctx, ev, c => s"graft.plans.FeatureDot.score($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "feature_dot"
}

object FeatureDot {

  /** Static entry the generated code calls. */
  def score(fs: ArrayData, w: Array[Long]): Long = {
    val n = fs.numElements()
    var acc = 0L
    var i = 0
    while (i < n) {
      val f = fs.getStruct(i, 2)
      val b = f.getInt(0)
      if (b < 0 || b >= w.length) throw new ArrayIndexOutOfBoundsException(
        s"feature_dot: bucket $b outside weight array of ${w.length}")
      acc += f.getLong(1) * w(b)
      i += 1
    }
    acc
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[FeatureDot].getName, "feature_dot")
}
