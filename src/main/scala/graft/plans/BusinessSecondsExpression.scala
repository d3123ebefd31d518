package graft.plans

import java.time.{LocalDateTime, ZoneOffset}

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, TimestampType}

import graft.functions.BusinessTime

/** Native Catalyst expression for business-seconds between two timestamps
  * (the engine's one piece of custom scalar logic, SURVEY.md §4 F5).
  *
  * Why an `Expression` and not the UDF in [[BusinessTime.businessSecondsUdf]]:
  * a ScalaUDF node boxes both timestamps into `java.time.Instant`, breaks
  * the whole-stage-codegen span it sits in, and blocks null-intolerant
  * optimizations. This expression stays inside codegen — `doGenCode` emits
  * a call on the primitive micros longs. Inputs must already be
  * TimestampType (checkInputDataTypes rejects others; no implicit casts).
  *
  * Null semantics: standard SQL (null in → null out), unlike the UDF,
  * which coerces null inputs to 0 — callers that relied on the UDF's 0
  * must coalesce explicitly.
  *
  * Calendar: this SQL function is pinned to the DEFAULT calendar. A
  * deployment injecting a custom calendar (year-specific holidays,
  * different hours) must use [[BusinessTime.businessSecondsUdf]], which
  * takes the calendar as a parameter — mixing the two paths with a
  * non-default calendar silently diverges.
  */
final case class BusinessSeconds(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (left.dataType == TimestampType && right.dataType == TimestampType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"business_seconds expects (timestamp, timestamp), got (${left.dataType}, ${right.dataType})")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override protected def nullSafeEval(startMicros: Any, endMicros: Any): Any =
    BusinessSeconds.evalMicros(startMicros.asInstanceOf[Long], endMicros.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (s, e) =>
      s"graft.plans.BusinessSeconds.evalMicros($s, $e)")

  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "business_seconds"
}

object BusinessSeconds {
  private val calendar = BusinessTime.Calendar()

  /** Static entry the generated code calls: micros-since-epoch → business
    * seconds under the default calendar (naive UTC wall time, matching the
    * reference's UTC-converted naive datetimes).
    */
  def evalMicros(startMicros: Long, endMicros: Long): Long = {
    val s = LocalDateTime.ofEpochSecond(Math.floorDiv(startMicros, 1000000L),
      (Math.floorMod(startMicros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    val e = LocalDateTime.ofEpochSecond(Math.floorDiv(endMicros, 1000000L),
      (Math.floorMod(endMicros, 1000000L) * 1000L).toInt, ZoneOffset.UTC)
    BusinessTime.businessSeconds(s, e, calendar)
  }

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[BusinessSeconds].getName, "business_seconds")
}
