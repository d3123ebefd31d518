package graft.sources

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSuite

/** The DataSource V2 tracker connector: TSV round-trip fidelity, filter
  * pushdown (claimed vs rejected), column pruning, and page-per-
  * partition planning.
  */
class Dsv2SourceSpec extends SparkSuite {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private lazy val dir: String = {
    val d = new java.io.File(sys.props("java.io.tmpdir"), "graft-dsv2-spec").getPath
    val rows = Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.5, """{"k": 1}"""),
      (2L, ts("2024-01-02 10:00:00"), 7L, "click", -0.25, """{"k": 2}"""),
      (3L, ts("2024-01-03 10:00:00"), 8L, "purchase", 99.125, """{"k": 3}"""),
      (4L, ts("2024-01-04 10:00:00"), 8L, "view", 0.0, """{"k": 4}"""))
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .select(col("event_id"), unix_micros(col("ts")).as("tsu"), col("user_id"),
        col("event_type"), col("value"), col("props"))
      .as[(Long, Long, Long, String, Double, String)]
      .map { case (e, t, u, ty, v, p) => graft.sources.v2.TrackerSource.encodeLine(e, t, u, ty, v, p) }
      .repartition(2)
      .write.mode("overwrite").text(d)
    d
  }

  private def read(): DataFrame =
    spark.read.format("graft.sources.v2.TrackerSource").option("path", dir).load()

  test("TSV pages round-trip all columns bit-exactly") {
    val got = read().orderBy("event_id")
      .as[(Long, Timestamp, Long, String, Double, String)].collect().toSeq
    assert(got == Seq(
      (1L, ts("2024-01-01 10:00:00"), 7L, "view", 1.5, """{"k": 1}"""),
      (2L, ts("2024-01-02 10:00:00"), 7L, "click", -0.25, """{"k": 2}"""),
      (3L, ts("2024-01-03 10:00:00"), 8L, "purchase", 99.125, """{"k": 3}"""),
      (4L, ts("2024-01-04 10:00:00"), 8L, "view", 0.0, """{"k": 4}""")))
  }

  test("supported filters are CLAIMED by the scan and evaluated at the source") {
    val q = read().where(col("event_type") === "view" &&
      col("ts") >= lit("2024-01-02 00:00:00").cast("timestamp"))
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: ["), plan)
    assert(plan.contains("EqualTo(event_type,view)"), plan)
    assert(plan.contains("GreaterThanOrEqual(ts,"), plan)
    assert(q.select("event_id").as[Long].collect().toSeq == Seq(4L))
  }

  test("unclaimable filters are rejected back to Spark and still applied") {
    val q = read().where(col("props").contains("3"))
    val plan = q.queryExecution.executedPlan.toString
    // the contains() predicate must NOT appear as pushed
    assert(!plan.replaceAll("(?s)PushedFilters: \\[[^\\]]*\\]", "")
      .isEmpty && !plan.contains("PushedFilters: [StringContains"), plan)
    assert(q.select("event_id").as[Long].collect().toSeq == Seq(3L))
  }

  test("column pruning reaches the reader (ReadSchema shows the projection)") {
    val q = read().select("event_id", "value")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<event_id:bigint,value:double>"), plan)
    assert(q.orderBy("event_id").as[(Long, Double)].collect().toSeq ==
      Seq((1L, 1.5), (2L, -0.25), (3L, 99.125), (4L, 0.0)))
  }

  test("one input partition per page file") {
    val files = new java.io.File(dir).listFiles
      .count(f => f.isFile && !f.getName.startsWith("_") && !f.getName.endsWith(".crc"))
    assert(read().rdd.getNumPartitions == files)
  }
}
