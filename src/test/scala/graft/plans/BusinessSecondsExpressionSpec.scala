package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.functions.BusinessTime

/** The native expression must agree with the reference-semantics UDF on
  * every input, run inside whole-stage codegen, and be SQL-callable.
  */
class BusinessSecondsExpressionSpec extends SparkSuite {

  private lazy val registered = { GraftExtensions.register(spark); true }

  private def pairs = {
    // 200 seeded (start, end) pairs spanning weekends/holidays/clipping
    val rnd = new scala.util.Random(5)
    val anchor = java.time.Instant.parse("2024-01-01T00:00:00Z")
    (0 until 200).map { _ =>
      (java.sql.Timestamp.from(anchor.plusSeconds(rnd.nextLong(120L * 86400))),
        java.sql.Timestamp.from(anchor.plusSeconds(rnd.nextLong(120L * 86400))))
    }
  }

  test("expression == UDF == direct Scala on 200 seeded intervals") {
    assert(registered)
    import spark.implicits._
    val df = pairs.toDF("s", "e")
    val out = df.select(
      GraftExtensions.businessSecondsExpr(col("s"), col("e")).as("native"),
      BusinessTime.businessSecondsUdf()(col("s"), col("e")).as("viaUdf"),
      col("s"), col("e")).collect()
    for (r <- out) {
      assert(r.getLong(0) == r.getLong(1))
      val direct = BusinessTime.businessSeconds(
        r.getTimestamp(2).toLocalDateTime, r.getTimestamp(3).toLocalDateTime)
      assert(r.getLong(0) == direct)
    }
  }

  test("SQL-callable and null-safe") {
    assert(registered)
    val r = spark.sql(
      """SELECT business_seconds(TIMESTAMP '2023-10-16 10:00:00', TIMESTAMP '2023-10-16 23:00:00') AS b,
        |       business_seconds(CAST(NULL AS TIMESTAMP), TIMESTAMP '2023-10-16 23:00:00') AS n""".stripMargin)
      .collect()(0)
    assert(r.getLong(0) == 12L * 3600)
    assert(r.isNullAt(1))
  }

  test("stays inside whole-stage codegen (no ScalaUDF break) over a parquet scan") {
    assert(registered)
    // a file scan prevents local-relation constant folding, so the plan
    // shows the real codegen stage the expression runs in
    val ev = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(GraftExtensions.businessSecondsExpr(
        col("ts"), col("ts") + expr("INTERVAL 1 DAY")).as("b"))
    val plan = ev.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"))
    // "*(1)" prefixes mark operators inside WholeStageCodegen stage 1
    assert(plan.linesIterator.next().startsWith("*(1) Project [business_seconds"))
    val viaUdf = graft.sources.Tables.events(spark, "/root/testdata/sf0.001")
      .select(BusinessTime.businessSecondsUdf()(col("ts"), col("ts") + expr("INTERVAL 1 DAY")).as("b"))
    assert(ev.collect().map(_.getLong(0)).toSeq == viaUdf.collect().map(_.getLong(0)).toSeq)
  }
}
