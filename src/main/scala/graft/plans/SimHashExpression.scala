package graft.plans

import java.security.MessageDigest
import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row SimHash fingerprint, `bits` wide: for every DISTINCT
  * whitespace token of the lowered/trimmed text, take the first `bits/4`
  * hex chars of its md5 as a long; bit j of the fingerprint is the sign
  * of Σ_tokens (bit_j(tokenHash) ? +1 : −1).
  *
  * Replaces the explode + `bits` sum-aggregates form — a full shuffle of
  * n·tokens rows and a 48-column hash aggregate — with shuffle-free map
  * work in one codegen'd loop. Fingerprints are bit-identical (same
  * trim/lower/split, same md5 hex-prefix arithmetic, same sign rule),
  * asserted against the aggregate form in DedupSpec.
  */
final case class SimHash64(child: Expression, bits: Int) extends UnaryExpression {

  require(bits % 4 == 0 && bits > 0 && bits <= 60, "bits must be a multiple of 4, <= 60 (hex-prefix long parse)")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"simhash64 expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.fingerprint(input.asInstanceOf[UTF8String], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SimHash64.fingerprint($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {

  private val Whitespace = Pattern.compile("\\s+")

  private val md5Local: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Static entry the generated code calls (named `fingerprint`, not
    * `eval` — see the static-forwarder note in [[SnakeCase.convert]]).
    */
  def fingerprint(input: UTF8String, bits: Int): Long = {
    // identical preprocessing to the aggregate form:
    // array_distinct(split(lower(trim(text)), "\s+")) — including the
    // empty token a blank text yields
    val s = input.trim().toLowerCase.toString
    val toks = Whitespace.split(s, -1)
    val seen = new java.util.HashSet[String](toks.length * 2)
    val counts = new Array[Int](bits)
    val md = md5Local.get()
    var t = 0
    while (t < toks.length) {
      val tok = toks(t)
      if (seen.add(tok)) {
        md.reset()
        val digest = md.digest(UTF8String.fromString(tok).getBytes)
        // first bits/4 hex chars of the md5 string = the high nibbles of
        // the digest, exactly conv(substring(md5(tok), 1, bits/4), 16, 10)
        var th = 0L
        var n = 0
        while (n < bits / 4) {
          val nibble = (digest(n / 2) >> (if (n % 2 == 0) 4 else 0)) & 0xF
          th = (th << 4) | nibble
          n += 1
        }
        var j = 0
        while (j < bits) {
          if (((th >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      t += 1
    }
    var fp = 0L
    var j = 0
    while (j < bits) {
      if (counts(j) > 0) fp |= 1L << j
      j += 1
    }
    fp
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[SimHash64].getName, "simhash64")
}
