package graft.plans

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The engine's md5-derived coin, natively:
  * `conv(substring(md5(c), 1, hexChars), 16, 10)` as a long, read
  * directly off the digest bytes.
  *
  * The composed form — the portable definition every oracle replays —
  * md5s the string, HEX-ENCODES all 16 digest bytes to a 32-char
  * string, substrings the first `hexChars` characters, and PARSES them
  * back with base-16 `conv`; only the first ⌈hexChars/2⌉ digest bytes
  * were ever needed. This expression computes the identical value with
  * no hex round-trip. It backs `QualityClassifier.md24` (the 24-bit
  * coin ~80 call sites share), the 56-bit HLL register coins, and the
  * b-bit minhash token hashes; the composed form stays the
  * spec-asserted reference (Md5PrefixSpec: equality on unicode /
  * empty / long strings at every used width).
  *
  * `hexChars` ≤ 15 keeps the value inside a non-negative long (60
  * bits) — same envelope the composed `conv(..)` form produced.
  */
final case class Md5Prefix(child: Expression, hexChars: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(hexChars >= 1 && hexChars <= 15,
    s"hexChars must be in [1, 15], got $hexChars")

  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"md5_prefix expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    Md5Prefix.compute(input.asInstanceOf[UTF8String], hexChars)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Md5Prefix.compute($c, $hexChars)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "md5_prefix"
}

object Md5Prefix {

  /** Column-level helper for call sites: md5_prefix(c, hexChars) as a
    * LongType column (the composed form returned conv(..)'s STRING and
    * every call site cast it — callers keep their cast, which is a
    * no-op value-wise on the long).
    */
  def of(c: org.apache.spark.sql.Column, hexChars: Int): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      Md5Prefix(org.apache.spark.sql.graft.ColumnBridge.expression(c), hexChars))

  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Static entry the generated code calls: the value of the first
    * `hexChars` hex digits of md5(input) — nibble-walk over the raw
    * digest, no hex string.
    */
  def compute(input: UTF8String, hexChars: Int): Long = {
    val md = Md5.get()
    md.reset()
    val d = md.digest(input.getBytes)
    var v = 0L
    var i = 0
    while (i < hexChars) {
      val b = d(i >> 1) & 0xff
      val nib = if ((i & 1) == 0) b >>> 4 else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }
}
