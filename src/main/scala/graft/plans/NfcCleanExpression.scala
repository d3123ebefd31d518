package graft.plans

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization + C0/DEL control-character strip in one
  * pass — the canonicalization every web-scale text pipeline runs
  * before fingerprinting: crawl text arrives with the SAME glyph in
  * different byte encodings (`e` + U+0301 combining acute vs the
  * precomposed U+00E9; compatibility singletons like the U+212B
  * Angstrom sign), so without canonical composition, exact dedup
  * treats visually identical documents as distinct and shingle hashes
  * diverge on the first decomposed accent. NFC (UAX #15 canonical
  * composition) is the idempotent, information-preserving choice —
  * NFKC also folds compatibility variants (ligatures, width) but is
  * lossy, so it stays a caller decision. Control characters in
  * C0 (except tab/newline/carriage return) and DEL are crawl noise
  * with no linguistic content and are dropped in the same scan.
  *
  * Spark has no built-in normalizer expression (the usual route is a
  * Scala UDF around `java.text.Normalizer` — boxed, codegen-opaque);
  * this kernel stays inside whole-stage codegen with a fast path that
  * returns the INPUT object untouched when it is already NFC and
  * control-free (`Normalizer.isNormalized` is a cheap scan, and
  * ASCII-clean text — the overwhelming majority at corpus scale —
  * never allocates).
  *
  * The driver oracle replays it as DuckDB `nfc_normalize` (utf8proc)
  * + a control-strip regex: both implement the same Unicode standard,
  * so results agree byte-for-byte.
  */
final case class NfcClean(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"nfc_clean expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    NfcClean.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.NfcClean.convert($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "nfc_clean"
}

object NfcClean {

  private def isControl(c: Char): Boolean =
    (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f

  /** Static entry the generated code calls (named `convert`, not `eval` —
    * see the static-forwarder note in [[SnakeCase.convert]]).
    */
  def convert(input: UTF8String): UTF8String = {
    val s = input.toString
    var hasControl = false
    var i = 0
    while (i < s.length && !hasControl) {
      if (isControl(s.charAt(i))) hasControl = true
      i += 1
    }
    if (!hasControl && Normalizer.isNormalized(s, Normalizer.Form.NFC)) return input
    val normalized = Normalizer.normalize(s, Normalizer.Form.NFC)
    val sb = new java.lang.StringBuilder(normalized.length)
    var j = 0
    while (j < normalized.length) {
      val c = normalized.charAt(j)
      if (!isControl(c)) sb.append(c)
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[NfcClean].getName, "nfc_clean")
}
