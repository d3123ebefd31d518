package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass native snake_case ≙ the 4-regex chain in
  * [[graft.functions.StringFns.snakeCase]] (reference helpers.py:110-113):
  * the regex form runs four full regex passes per row, this expression one
  * character scan — the difference matters on wide text projections at
  * corpus scale. Equivalence is fuzz-tested against the regex chain
  * (SnakeCaseExpressionSpec).
  *
  * The sequential regexes compose cleanly into one pass because each
  * inserted `_` is outside every boundary class, so later rules never see
  * boundaries created by earlier ones: for each adjacent original pair
  * (p, c) insert `_` when lower→UPPER, lower→digit, or digit→lower
  * (Latin + Cyrillic а-яё classes), then map non-alphanumerics to `_` and
  * lowercase.
  */
final case class SnakeCase(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"snake_case expects string, got ${child.dataType}")

  override protected def nullSafeEval(input: Any): Any =
    SnakeCase.convert(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.SnakeCase.convert($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "snake_case"
}

object SnakeCase {

  private def isLowerCls(c: Int): Boolean =
    (c >= 'a' && c <= 'z') || (c >= 'а' && c <= 'я') || c == 'ё'
  private def isUpperCls(c: Int): Boolean =
    (c >= 'A' && c <= 'Z') || (c >= 'А' && c <= 'Я') || c == 'Ё'
  private def isDigit(c: Int): Boolean = c >= '0' && c <= '9'
  private def isWordCls(c: Int): Boolean =
    isLowerCls(c) || isUpperCls(c) || isDigit(c) || c == '_'

  /** Static entry the generated code calls. Named `convert`, NOT `eval`:
    * the companion's case class inherits `Expression.eval`, and Scala
    * suppresses static forwarders whose name collides with a companion
    * member — a static `eval` would never exist, Janino would fail to
    * resolve it, and Spark would silently fall back to interpreted mode.
    */
  def convert(input: UTF8String): UTF8String = {
    val s = input.toString
    // blank check mirrors Spark's trim(): SPACES only (Java's String.trim
    // also strips tabs/control chars and would diverge — fuzz-caught)
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    if (b == e) return UTF8String.fromString("")
    // iterate by CODEPOINT: a regex `.`-class replacement maps one
    // supplementary char (e.g. an emoji surrogate pair) to ONE `_`
    // (fuzz-caught — a per-char loop emitted two)
    val sb = new java.lang.StringBuilder(s.length + 8)
    var i = 0
    var prev = -1
    while (i < s.length) {
      val cp = s.codePointAt(i)
      if (prev >= 0 &&
          ((isLowerCls(prev) && isUpperCls(cp)) ||
            (isLowerCls(prev) && isDigit(cp)) ||
            (isDigit(prev) && isLowerCls(cp)))) sb.append('_')
      if (isWordCls(cp)) sb.appendCodePoint(Character.toLowerCase(cp)) else sb.append('_')
      prev = cp
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[SnakeCase].getName, "snake_case")
}
