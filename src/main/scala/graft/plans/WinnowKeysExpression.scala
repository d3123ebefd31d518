package graft.plans

import java.nio.charset.StandardCharsets
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing selection keys — the k-gram hash stream of
  * `Winnow.fingerprints` — as ONE codegen'd pass: element `pos` of the
  * returned `array<long>` is
  *
  *   md24(gram_pos) · 2²⁴ + (2²⁴ − 1 − pos)
  *
  * over the whitespace-lowered token stream's k-gram at 0-based
  * position `pos` (gram = k tokens joined by single spaces), i.e.
  * exactly the `_key` the composed form computed with a
  * CodegenFallback `transform` + `array_join(slice(..))` per gram and
  * the md5 → hex → substring → base-16-parse chain per hash. A
  * document with fewer than k tokens returns an EMPTY array (the
  * composed form's `where(_n >= k)` — callers filter on size).
  * `posexplode` over the result reproduces the composed (pos, _key)
  * rows bit for bit (spec-asserted against the kept composed form in
  * WinnowSpec).
  *
  * Tokenization fidelity: trim strips SPACES only (UTF8String.trim =
  * Spark's trim()), toLowerCase is Spark's lower(), and the split
  * pattern/limit are the same `\s+` Java regex with limit −1 that
  * Spark's split() compiles — the ShingleHashes discipline.
  */
final case class WinnowKeys(child: Expression, k: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(k >= 1, s"k must be >= 1, got $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"winnow_keys expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    WinnowKeys.compute(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.WinnowKeys.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "winnow_keys"
}

object WinnowKeys {

  private val Whitespace = Pattern.compile("\\s+")
  private val PosBits = 16777216L // 2^24

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry the generated code calls. */
  def compute(input: UTF8String, k: Int): ArrayData = {
    val s = input.trim().toLowerCase.toString
    val toks = Whitespace.split(s, -1)
    val n = toks.length - k + 1
    if (n <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val md = Md5.get()
    val keys = new Array[Long](n)
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
      md.reset()
      val d = md.digest(sb.toString.getBytes(StandardCharsets.UTF_8))
      val h = (((d(0) & 0xffL) << 16) | ((d(1) & 0xffL) << 8) | (d(2) & 0xffL))
      keys(i) = h * PosBits + (PosBits - 1L - i)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(keys)
  }
}
