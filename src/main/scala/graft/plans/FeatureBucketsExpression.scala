package graft.plans

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native hashed-feature bucketing — the featurization core shared by
  * the classifier family (`QualityClassifier.hashedFeatures` / `score`)
  * and DSIR (`CorpusSelection.dsirScores`): unigrams ++ bigrams of the
  * whitespace-lowered token stream, each hashed to
  * `md24(feature) % buckets`, emitted as ONE `array<int>` per document
  * in a single codegen'd pass.
  *
  * The composed form it replaces ran per corpus pass:
  *   - a `transform`/`concat`/`element_at` HOF chain to BUILD the
  *     bigram strings (higher-order functions are CodegenFallback —
  *     one boxed lambda eval per bigram per doc), then
  *   - per exploded feature, `conv(substring(md5(f), 1, 6), 16, 10)` —
  *     an md5, a 32-char HEX ENCODE, a substring, and a base-16 string
  *     PARSE, where only the digest's first 3 bytes were ever needed.
  *
  * Here tokens are split once, bigrams are StringBuilder concats, and
  * the bucket is read directly off the raw md5 digest bytes — no hex
  * round-trip. Equivalence is exact and spec-asserted against the kept
  * composed form (QualityClassifierSpec):
  *
  *   - `trim` strips SPACES only (UTF8String.trim — Spark's trim()),
  *     `toLowerCase` is Spark's lower(), the split pattern and limit
  *     (-1: trailing empties kept, leading match yields an empty first
  *     token) are the same `\s+` Java regex Spark's split() compiles —
  *     byte-identical token streams, including the [""] single token
  *     of an all-space document (the composed form hashed it too);
  *   - `md24(f) % buckets` = first 24 bits of md5 = the first 3 digest
  *     bytes big-endian; md24 is non-negative so `%` == pmod.
  */
final case class FeatureBuckets(child: Expression, buckets: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(buckets >= 1, s"buckets must be >= 1, got $buckets")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"feature_buckets expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    FeatureBuckets.compute(input.asInstanceOf[UTF8String], buckets)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.FeatureBuckets.compute($c, $buckets)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "feature_buckets"
}

object FeatureBuckets {

  private val Whitespace = Pattern.compile("\\s+")

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry the generated code calls (the [[ShingleHashes.compute]]
    * naming discipline).
    */
  def compute(input: UTF8String, buckets: Int): ArrayData = {
    // trim() strips SPACES only and toLowerCase is Spark's lower() —
    // byte-identical to the trim/lower the composed form applied
    val s = input.trim().toLowerCase.toString
    val toks = Whitespace.split(s, -1)
    val n = toks.length
    val nBig = if (n >= 2) n - 1 else 0
    val out = new Array[Int](n + nBig)
    val md = Md5.get()
    var i = 0
    while (i < n) {
      out(i) = bucketOf(md, toks(i), buckets)
      i += 1
    }
    i = 0
    while (i < nBig) {
      out(n + i) = bucketOf(md, toks(i) + " " + toks(i + 1), buckets)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** md24(f) % buckets: the first 3 md5 digest bytes big-endian —
    * exactly conv(substring(md5(f), 1, 6), 16, 10) — mod buckets
    * (non-negative, so % == pmod).
    */
  private def bucketOf(md: java.security.MessageDigest, f: String,
                       buckets: Int): Int = {
    md.reset()
    val d = md.digest(f.getBytes(StandardCharsets.UTF_8))
    val v = ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
    v % buckets
  }
}
