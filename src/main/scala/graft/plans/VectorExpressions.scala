package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Native vector arithmetic for the similarity/dedup operators.
  *
  * Spark's higher-order functions (`zip_with`/`aggregate`) are
  * CodegenFallback expressions: every dot product runs interpreted, with a
  * lambda-variable box per element. At embedding scale (planes × dim
  * multiplies per row for LSH bucketing, dim multiplies per scored pair)
  * that interpretation overhead dominates the whole operator, so the two
  * hot kernels get codegen-capable expressions with tight primitive loops.
  *
  * Arithmetic is IDENTICAL to the HOF forms they replace (same left-fold
  * order, same IEEE ops), so results — and the DuckDB oracle mirrors that
  * reproduce the same folds — are bit-for-bit unchanged. Equivalence is
  * asserted against the HOF forms in SimilaritySpec.
  */
final case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"dot_product expects two array<double>, got ($l, $r)")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    DotProduct.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("dot")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed = graft.plans.DotProduct.compute(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "dot_product"
}

object DotProduct {

  /** Static entry the generated code calls (named `compute`, not `eval` —
    * see the static-forwarder note in [[SnakeCase.convert]]). Mirrors
    * `aggregate(zip_with(a, b, (x,y) => x*y), 0.0, (acc,x) => acc+x)`
    * exactly: null if either side is null, if lengths differ (zip_with
    * pads the shorter side with null) or any element is null (null
    * poisons the fold); otherwise the left-fold double sum.
    */
  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[DotProduct].getName, "dot_product")
}

/** Random-hyperplane LSH bucket id in one pass: bit `i` of the result is
  * the sign of `vec · planes(i)`. Replaces `planes` separate interpreted
  * HOF dot-folds per row with a single codegen'd `planes × dim` loop.
  *
  * Per-plane semantics mirror the composed form
  * `when(dot(vec, plane) >= 0, 1L << i).otherwise(0)`: a NaN or null dot
  * (length mismatch) contributes a 0 bit, and the per-plane fold order is
  * identical, so bucket ids are bit-for-bit unchanged.
  */
final case class HyperplaneBucket(child: Expression, planes: Seq[Seq[Double]]) extends UnaryExpression {

  require(planes.nonEmpty && planes.size <= 62, "1..62 hyperplanes per bucket id")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"hyperplane_bucket expects array<double>, got $t")
  }

  @transient private lazy val planesArr: Array[Array[Double]] = planes.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    HyperplaneBucket.bucket(input.asInstanceOf[ArrayData], planesArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", planesArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.HyperplaneBucket.bucket($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "hyperplane_bucket"
}

/** Index of the nearest centroid (squared L2) in one codegen'd
  * cells × dim loop — replaces the composed
  * `array_max(array(struct(-d2, cell), ...)).getField("cell")` form whose
  * per-cell interpreted HOF distance folds dominated the IVF assign step.
  * Semantics mirror that form exactly: same left-fold d2 arithmetic, ties
  * break to the HIGHER cell id, and a NaN distance wins like NaN sorts
  * greatest in Spark struct ordering. Length-mismatched input yields a
  * null d2 in the composed form; nulls compare equal in struct ordering,
  * so when EVERY cell mismatches the composed form tie-breaks to the
  * HIGHEST cell — mirrored here by initializing `best` to the last cell.
  */
final case class NearestCentroid(child: Expression, centroids: Seq[Seq[Double]]) extends UnaryExpression {

  require(centroids.nonEmpty, "at least one centroid")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"nearest_centroid expects array<double>, got $t")
  }

  @transient private lazy val centroidsArr: Array[Array[Double]] = centroids.map(_.toArray).toArray

  override protected def nullSafeEval(input: Any): Any =
    NearestCentroid.assign(input.asInstanceOf[ArrayData], centroidsArr)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroids", centroidsArr, "double[][]")
    defineCodeGen(ctx, ev, c => s"graft.plans.NearestCentroid.assign($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nearest_centroid"
}

object NearestCentroid {

  def assign(vec: ArrayData, centroids: Array[Array[Double]]): Int = {
    val n = vec.numElements()
    // a null element nulls EVERY cell's d2 in the composed form (each
    // fold includes it), which tie-breaks to the highest cell — same as
    // the all-length-mismatch fallback below
    var i = 0
    while (i < n) {
      if (vec.isNullAt(i)) return centroids.length - 1
      i += 1
    }
    var best = centroids.length - 1 // all-mismatch fallback = highest cell
    var bestD2 = Double.PositiveInfinity
    var taken = false
    var j = 0
    while (j < centroids.length) {
      val c = centroids(j)
      if (n == c.length) {
        var d2 = 0.0
        var i = 0
        while (i < n) {
          val t = vec.getDouble(i) - c(i)
          d2 += t * t
          i += 1
        }
        val curNaN = java.lang.Double.isNaN(d2)
        val bestNaN = java.lang.Double.isNaN(bestD2)
        if (!taken || curNaN || (!bestNaN && d2 <= bestD2)) {
          best = j; bestD2 = d2; taken = true
        }
      }
      j += 1
    }
    best
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[NearestCentroid].getName, "nearest_centroid")
}

object HyperplaneBucket {

  def bucket(vec: ArrayData, planes: Array[Array[Double]]): Long = {
    val n = vec.numElements()
    var bits = 0L
    var i = 0
    while (i < planes.length) {
      val pl = planes(i)
      if (n == pl.length) {
        var nulls = false
        var d = 0.0
        var j = 0
        while (j < n) {
          if (vec.isNullAt(j)) { nulls = true; j = n }
          else { d += vec.getDouble(j) * pl(j); j += 1 }
        }
        if (!nulls && d >= 0) bits |= 1L << i
      }
      i += 1
    }
    bits
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[HyperplaneBucket].getName, "hyperplane_bucket")
}
