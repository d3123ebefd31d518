package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo, UnaryExpression, UnsafeArrayData, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hashed word k-shingles of a text column in ONE pass: trim(spaces) →
  * lower → whitespace split → k-gram join → xxhash64(seed 42) → distinct →
  * sorted ascending. Replaces the five-deep interpreted HOF pipeline
  * (`flatten(transform(array(split(..)), toks => array_distinct(filter(
  * transform(sequence(..), ..)))))` + per-element `xxhash64`) that built
  * the same set — HOFs are CodegenFallback, and the per-shingle lambda
  * boxing dominated every shingle-based dedup operator.
  *
  * Set equality with the HOF form is exact (same trim/lower/split
  * semantics, same hash seed); the element ORDER differs (sorted here,
  * first-occurrence there), which every consumer — min-fold (MinHash),
  * set intersection (Jaccard) — is insensitive to. Sorting is what makes
  * [[JaccardSorted]] an allocation-free linear merge instead of a
  * hash-set build per compared pair. Docs with fewer than k tokens yield
  * an EMPTY array, mirroring the HOF form's short-doc guard.
  */
final case class ShingleHashes(child: Expression, k: Int) extends UnaryExpression {

  require(k >= 1, "shingle width k must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"shingle_hashes expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.ShingleHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {

  private val Whitespace = Pattern.compile("\\s+")
  private val Seed = 42L // Spark's xxhash64() default seed

  /** Static entry the generated code calls (named `compute`, not `eval` —
    * see the static-forwarder note in [[SnakeCase.convert]]).
    */
  def compute(input: UTF8String, k: Int): ArrayData = {
    // trim() strips SPACES only and toLowerCase is Spark's lower() —
    // byte-identical to the trim/lower expressions the HOF form applied
    val s = input.trim().toLowerCase.toString
    val toks = Whitespace.split(s, -1)
    val n = toks.length - k + 1
    if (n <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hashes = new Array[Long](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val u = UTF8String.fromString(sb.toString)
      hashes(i) = XxHash64Function.hash(u, StringType, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    // in-place distinct on the sorted array
    var w = 1
    i = 1
    while (i < n) {
      if (hashes(i) != hashes(w - 1)) { hashes(w) = hashes(i); w += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(hashes, w))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes")
}

/** Exact Jaccard similarity of two SORTED distinct long arrays as a
  * single linear merge — no per-pair hash-set allocation, which is what
  * made `size(array_intersect(a,b)) / size(array_distinct(concat(a,b)))`
  * the bottleneck of the exhaustive n-gram baseline (one set build per
  * compared pair). Null when both sides are empty (the ANSI-safe 0/0
  * guard), null-poisoned like any binary expression otherwise; values are
  * bit-identical to the set-expression form (same integer counts, same
  * double division).
  */
final case class JaccardSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"jaccard_sorted expects two array<long>, got ($l, $r)")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    JaccardSorted.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("jac")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed = graft.plans.JaccardSorted.compute(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "jaccard_sorted"
}

object JaccardSorted {

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements()
    val lb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    val union = la + lb - inter
    if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union.toDouble)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[JaccardSorted].getName, "jaccard_sorted")
}

/** ASYMMETRIC set containment C(A ⊆ B) = |A∩B| / |A| of two SORTED
  * distinct long arrays — the doc-in-doc signal Jaccard structurally
  * cannot give (a short document fully quoted inside a long one has
  * tiny Jaccard but containment 1.0; Broder 1997 distinguishes
  * "resemblance" from exactly this "containment"). Same allocation-free
  * linear merge as [[JaccardSorted]]; null when the LEFT (contained
  * candidate) side is empty — 0/0 has no meaning and ANSI mode must not
  * see the division.
  */
final case class ContainmentSorted(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(s"containment_sorted expects two array<long>, got ($l, $r)")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val l = left.eval(input)
    if (l == null) return null
    val r = right.eval(input)
    if (r == null) return null
    ContainmentSorted.compute(l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val leftGen = left.genCode(ctx)
    val rightGen = right.genCode(ctx)
    val boxed = ctx.freshName("cont")
    val code =
      code"""
        ${leftGen.code}
        ${rightGen.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${leftGen.isNull} && !${rightGen.isNull}) {
          java.lang.Double $boxed = graft.plans.ContainmentSorted.compute(${leftGen.value}, ${rightGen.value});
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed.doubleValue(); }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "containment_sorted"
}

object ContainmentSorted {

  def compute(a: ArrayData, b: ArrayData): java.lang.Double = {
    val la = a.numElements()
    if (la == 0) return null
    val lb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    while (i < la && j < lb) {
      val va = a.getLong(i)
      val vb = b.getLong(j)
      if (va == vb) { inter += 1; i += 1; j += 1 }
      else if (va < vb) i += 1
      else j += 1
    }
    java.lang.Double.valueOf(inter.toDouble / la.toDouble)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[ContainmentSorted].getName, "containment_sorted")
}
