package graft.queries

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.schema.Schemas
import graft.sources.Tables
import graft.transform.IssueTransform

/** Deterministic raw-issue fixture (the README 7-step walkthrough +
  * no-changelog + resolved variants, FIXTURES.md §3) built in-memory, so
  * the REAL pipeline transform gets driver-verified correctness rows: its
  * expected output is a literal `VALUES` oracle in [[Oracles]].
  */
object PipelineFixture {

  private def ref1(v: String): Row = Row(v)
  private def variant(s: String = null, r: Row = null): Row = Row(s, null, r, null, null)
  private def refv(name: String): Row = Row(null, null, name, null)

  private def statusField(from: String, to: String): Row =
    Row(Row("status", "Status"), variant(r = refv(from)), variant(r = refv(to)))

  private def dtField(from: String, to: String): Row =
    Row(Row("statusStartTime", "Status start time"), variant(s = from), variant(s = to))

  private def wfEvent(at: String, fields: Seq[Row]): Row =
    Row(at, "IssueWorkflow", "front", Row("Dev@Example.com", "Dev Name"), fields)

  private def t(hhmm: String): String = s"2024-01-09T$hhmm:00.000+0000"

  private def issue(key: String, status: String, resolution: String = null,
                    resolvedAt: String = null, changelog: Seq[Row] = Seq.empty): Row =
    Row(
      key, "Walkthrough😎", ref1("TEST"), ref1("Task"), ref1("Normal"), ref1(status),
      Option(resolution).map(ref1).orNull,
      ref1("Dev@Example.com"), ref1("Author@Example.com"), ref1("QA@Example.com"),
      null, null, ref1("MyProject"),
      Seq(ref1("Sprint 1")), Seq(ref1("backend")), Seq("t1"), null,
      3.0f, t("10:00"), t("18:00"), resolvedAt,
      "2024-01-09", "2024-01-10", "2024-01-11", changelog)

  private val walkthroughEvents = Seq(
    wfEvent(t("11:00"), Seq(statusField("Open", "In progress"), dtField(null, t("11:00")))),
    wfEvent(t("13:00"), Seq(statusField("In progress", "Testing"), dtField(t("11:00"), t("13:00")))),
    wfEvent(t("14:00"), Seq(statusField("Testing", "In progress"), dtField(t("13:00"), t("14:00")))),
    wfEvent(t("16:00"), Seq(statusField("In progress", "Testing"), dtField(t("14:00"), t("16:00")))),
    wfEvent(t("17:00"), Seq(statusField("Testing", "Ready for release"), dtField(t("16:00"), t("17:00")))),
    wfEvent(t("18:00"), Seq(statusField("Ready for release", "Closed"), dtField(t("17:00"), t("18:00")))))

  def raw(spark: SparkSession): DataFrame =
    spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        issue("TEST-1", "Closed", changelog = walkthroughEvents),
        issue("TEST-2", "Open"),
        issue("TEST-3", "Closed", resolution = "Fixed", resolvedAt = t("19:00"),
          changelog = Seq(wfEvent(t("18:00"), Seq(statusField("Open", "Closed"), dtField(null, t("18:00")))))),
        // CamelCase status/type names: the reference lowercases BEFORE
        // snake_casing ('InProgress' → 'inprogress'), and this row makes
        // the driver's oracle catch any drift in that composition
        issue("TEST-4", "InProgress",
          changelog = Seq(wfEvent(t("12:00"), Seq(statusField("SelectedForDev", "InProgress"), dtField(null, t("12:00")))))))),
      Schemas.rawIssue)

  /** Metric rows of the walkthrough corpus (A1 end-to-end). */
  def pipelineMetrics(s: SparkSession, d: String): DataFrame =
    IssueTransform.metrics(IssueTransform.workflowEvents(raw(s)), lit(null).cast("timestamp"))
      .drop("version")
      .orderBy(col("issue_key"), col("status_name"))

  /** The pipeline at volume: synthesize one nested issue document per
    * events-table user (its events become workflow status transitions,
    * assembled into a changelog array via window-ordered collect_list),
    * then run the REAL workflow-event extraction + metric aggregation.
    * Exercises the whole nested-document path — struct/array construction,
    * posexplode, filters, wire-format datetime round trip, business
    * seconds — on ~100k rows at sf0.1, with a full DuckDB oracle.
    */
  def pipelineScale(s: SparkSession, d: String): DataFrame = {
    val wire = "yyyy-MM-dd'T'HH:mm:ss.SSSXX"
    def fmt(c: Column): Column = date_format(c, wire)
    def vS(c: Column): Column =
      struct(c.as("s"), lit(null).cast("struct<name:string>").as("ref"))
    def vRef(c: Column): Column =
      struct(lit(null).cast("string").as("s"), struct(c.as("name")).as("ref"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"),
        lag(col("event_type"), 1).over(w).as("prev_type"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .where(col("prev_type").isNotNull)
    val eventStruct = struct(
      fmt(col("ts")).as("updatedAt"),
      lit("IssueWorkflow").as("type"),
      lit("api").as("transport"),
      array(
        struct(struct(lit("status").as("id")).as("field"),
          vRef(col("prev_type")).as("from"), vRef(col("event_type")).as("to")),
        struct(struct(lit("times").as("id")).as("field"),
          vS(fmt(col("prev_ts"))).as("from"), vS(fmt(col("ts"))).as("to"))).as("fields"))
    val raw = ev
      .groupBy(col("user_id"))
      .agg(
        sort_array(collect_list(struct(col("ts"), col("event_id"), eventStruct.as("ev")))).as("evs"),
        min(col("prev_ts")).as("created"))
      .select(
        concat(lit("U"), col("user_id").cast("string")).as("key"),
        fmt(col("created")).as("createdAt"),
        transform(col("evs"), x => x.getField("ev")).as("changelog"))
    IssueTransform.metrics(IssueTransform.workflowEvents(raw), lit(null).cast("timestamp"))
      .drop("version")
      .orderBy(col("issue_key"), col("status_name"))
  }

  /** Issue rows (P1–P5 end-to-end, changelog-derived scalars included). */
  def pipelineIssues(s: SparkSession, d: String): DataFrame =
    IssueTransform.issues(raw(s), version = lit(null).cast("timestamp"))
      .select(
        col("issue_key"), col("queue"), col("title"), col("issue_type"), col("priority"),
        col("status"), col("resolution"), col("assignee"), col("project"),
        col("is_closed"), col("is_resolved"), col("is_subtask"), col("was_moved"),
        col("story_points"), col("created_at"), col("closed_at"), col("deadline"))
      .orderBy(col("issue_key"))
}
