package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.{BusinessTime, StringFns, TimeFns}
import graft.schema.EngineConfig

/** The issue-document transform: nested raw issues → the three flat
  * tables (`issues`, `issue_metrics`, `issues_changelog`).
  *
  * Spark-first re-expression of the reference's per-issue Python loop
  * (models/issue.py:74-258): the projection is one `select`, the changelog
  * walk is `posexplode` + filters, the metric accumulator is a hash
  * aggregate, and the per-issue scalars derived from the changelog
  * (closed_at fallback, moved flags) come back via equi-joins on
  * `issue_key` — all shuffle boundaries are keyed by issue, so at 100 TB
  * the whole pipeline is one partition-local pass after a single exchange.
  */
object IssueTransform {

  private val WIRE_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSXX"
  private val OUT_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS"

  private def parseDt(c: Column): Column = TimeFns.parseTrackerDatetime(c)

  /** null-safe lowered access (validate_resource low=True, helpers.py:91-99). */
  private def low(c: Column): Column = lower(c)

  private def snakeLower(c: Column): Column = StringFns.snakeCase(lower(c))

  private def emptyStrArray: Column = array().cast("array<string>")

  /** Workflow status-transition events, one row per valid transition
    * (models/issue.py:169-199): `IssueWorkflow` events with ≥2 fields,
    * fields[0].field.id == "status", non-null datetime range; the first
    * transition's start anchors at `createdAt` (issue.py:185).
    * `pos` is the changelog array index (event order — used for
    * set-once/last-wins semantics downstream).
    */
  def workflowEvents(raw: DataFrame, cfg: EngineConfig = EngineConfig()): DataFrame =
    raw
      .select(
        col("key").as("issue_key"),
        col("createdAt").as("_created_raw"),
        posexplode(col("changelog")).as(Seq("pos", "ev")))
      .where(col("ev.type") === "IssueWorkflow")
      .where(size(col("ev.fields")) >= 2)
      .where(col("ev.fields")(0).getField("field").getField("id") === "status")
      .select(
        col("issue_key"), col("pos"),
        snakeLower(col("ev.fields")(0).getField("from").getField("ref").getField("name")).as("status_name"),
        snakeLower(col("ev.fields")(0).getField("to").getField("ref").getField("name")).as("to_status"),
        coalesce(col("ev.fields")(1).getField("from").getField("s"), col("_created_raw")).as("_start_raw"),
        col("ev.fields")(1).getField("to").getField("s").as("_end_raw"))
      .where(col("_start_raw").isNotNull && col("_end_raw").isNotNull)
      .select(
        col("issue_key"), col("pos"), col("status_name"), col("to_status"),
        parseDt(col("_start_raw")).as("start_ts"),
        parseDt(col("_end_raw")).as("end_ts"))
      // an unparseable wire datetime nulls out under try-parse; drop the
      // event like the reference's per-row error isolation drops it (P9,
      // etl.py:180-183) — downstream durations/last_seen stay non-null
      .where(col("start_ts").isNotNull && col("end_ts").isNotNull)
      .withColumn("duration", abs(TimeFns.timedeltaSeconds(col("end_ts"), col("start_ts"))))
      .withColumn("busdays_duration",
        BusinessTime.businessSecondsUdf(cfg.calendar)(col("start_ts"), col("end_ts")))

  /** A1: per-(issue, from-status) metric rows ≙ issue_metrics DDL
    * (models/issue.py:212-224, row class :43-62). `last_seen` is the end
    * time of the *first* event that created the group (set once —
    * `min_by(end_ts, pos)`), durations/counts accumulate.
    */
  def metrics(workflow: DataFrame, version: Column): DataFrame =
    workflow
      .groupBy(col("issue_key"), col("status_name"))
      .agg(
        count(lit(1)).cast("int").as("status_transitions_count"),
        sum(col("duration")).as("duration"),
        sum(col("busdays_duration")).as("busdays_duration"),
        min_by(col("end_ts"), col("pos")).as("last_seen"))
      .select(
        version.as("version"),
        col("last_seen"), col("issue_key"), col("status_name"),
        col("status_transitions_count"),
        col("duration"),
        TimeFns.toHumanTime(col("duration"), 2).as("human_readable_duration"),
        col("busdays_duration"),
        TimeFns.toHumanTime(col("busdays_duration"), 2).as("human_readable_busdays_duration"))

  /** P1–P5 wide projection ≙ issues DDL (models/issue.py:74-107), plus the
    * changelog-derived scalars: `closed_at` fallback (issue.py:204-210 —
    * resolved time if resolved, else end time of the last transition into
    * a closed status when the current status is closed) and
    * was_moved/moved_at/moved_by (issue.py:162-167, last IssueMoved wins).
    */
  /** U1 extensibility: extra user columns appended to the projection —
    * the Spark-first replacement for subclassing `TrackerIssue`
    * (examples/extended_model/main.py:9-31): each (name, expression over
    * the raw document) lands as an additional output column.
    */
  def issues(raw: DataFrame, cfg: EngineConfig = EngineConfig(), version: Column = current_timestamp(),
             extraColumns: Seq[(String, Column)] = Nil): DataFrame = {
    val wf = workflowEvents(raw, cfg)
    val closedSeq = cfg.closedStatuses.toSeq.sorted
    val lastClosed = wf
      .where(col("to_status").isInCollection(closedSeq))
      .groupBy(col("issue_key"))
      .agg(max_by(col("end_ts"), col("pos")).as("_last_closed_end"))
    val moved = raw
      .select(col("key").as("issue_key"), posexplode(col("changelog")).as(Seq("pos", "ev")))
      .where(col("ev.type") === "IssueMoved")
      .groupBy(col("issue_key"))
      .agg(
        max_by(parseDt(col("ev.updatedAt")), col("pos")).as("_moved_at"),
        max_by(low(col("ev.updatedBy.email")), col("pos")).as("_moved_by"))

    val extra = extraColumns.map { case (n, c) => c.as(n) }
    val proj = raw.select(Seq(
      col("key").as("issue_key"),
      col("queue.key").as("queue"),
      StringFns.stripEmoji(col("summary")).as("title"),
      // lowercase BEFORE snake_casing (validate_resource low=True then
      // to_snake_case, helpers.py:91-99 + models/issue.py:83-86): the
      // reference maps 'InProgress' → 'inprogress', not 'in_progress' —
      // and workflowEvents' to_status uses the same composition, so the
      // is_closed/closed_at comparisons below see consistent spellings
      snakeLower(col("type.name")).as("issue_type"),
      low(col("priority.name")).as("priority"),
      snakeLower(col("status.name")).as("status"),
      snakeLower(col("resolution.name")).as("resolution"),
      low(col("assignee.email")).as("assignee"),
      low(col("createdBy.email")).as("author"),
      low(col("qaEngineer.email")).as("qa_engineer"),
      coalesce(col("tags"), emptyStrArray).as("tags"),
      coalesce(transform(col("components"), c => c.getField("name")), emptyStrArray).as("components"),
      low(col("project.name")).as("project"),
      parseDt(col("createdAt")).as("created_at"),
      parseDt(col("updatedAt")).as("updated_at"),
      to_date(col("deadline")).as("deadline"),
      parseDt(col("resolvedAt")).as("resolved_at"),
      to_date(col("start")).as("start_date"),
      to_date(col("end")).as("end_date"),
      coalesce(col("storyPoints"), lit(0f)).as("story_points"),
      coalesce(transform(col("sprint"), s => s.getField("name")), emptyStrArray).as("sprints"),
      col("parent.key").as("parent_issue_key"),
      col("epic.key").as("epic_issue_key"),
      coalesce(col("aliases"), emptyStrArray).as("aliases")) ++ extra: _*)

    proj
      .join(lastClosed, Seq("issue_key"), "left")
      .join(moved, Seq("issue_key"), "left")
      .withColumn("is_resolved", col("resolution").isNotNull)
      // coalesce keeps is_closed BOOLEAN-not-null for a null status:
      // Python's `None in closed` is False, while SQL's `null IN (...)`
      // is null — the reference semantics are the non-null ones
      .withColumn("is_closed",
        coalesce(col("status").isInCollection(closedSeq), lit(false)) || col("is_resolved"))
      .withColumn("is_subtask", col("parent_issue_key").isNotNull && col("parent_issue_key") =!= "")
      .withColumn("closed_at",
        when(col("is_resolved") && col("resolved_at").isNotNull, col("resolved_at"))
          .when(col("status").isInCollection(closedSeq), col("_last_closed_end")))
      .withColumn("was_moved", col("_moved_at").isNotNull)
      .withColumn("moved_at", col("_moved_at"))
      .withColumn("moved_by", col("_moved_by"))
      .withColumn("version", version)
      .select(Seq(
        col("version"), col("queue"), col("title"), col("issue_key"), col("issue_type"),
        col("priority"), col("status"), col("resolution"), col("assignee"), col("author"),
        col("qa_engineer"), col("tags"), col("components"), col("project"), col("created_at"),
        col("updated_at"), col("deadline"), col("closed_at"), col("resolved_at"),
        col("start_date"), col("end_date"), col("is_subtask"), col("is_closed"),
        col("is_resolved"), col("story_points"), col("sprints"), col("parent_issue_key"),
        col("epic_issue_key"), col("aliases"), col("was_moved"), col("moved_at"), col("moved_by"))
        ++ extraColumns.map { case (n, _) => col(n) }: _*)
  }

  /** F9: stringify a heterogeneous changelog value (variant struct) —
    * type dispatch ≙ extract_changelog_field (utils/helpers.py:261-298):
    * list → comma-join; string → datetime-reformat if parseable, else
    * >100-char truncation; reference → first of key/email(lowered)/name/id;
    * number → integral-aware str; json passes through; null → "".
    */
  def stringifyVariant(v: Column): Column = {
    val s = v.getField("s")
    val asDt = try_to_timestamp(s, lit(WIRE_FMT))
    val strCase = when(asDt.isNotNull, date_format(asDt, OUT_FMT))
      .when(length(s) > 100, lit("text too long, see history in UI"))
      .otherwise(s)
    val r = v.getField("ref")
    val refCase = coalesce(r.getField("key"), low(r.getField("email")), r.getField("name"), r.getField("id"))
    val n = v.getField("n")
    val numCase = when(n === floor(n), n.cast("long").cast("string")).otherwise(n.cast("string"))
    coalesce(
      when(s.isNotNull, strCase),
      when(n.isNotNull, numCase),
      when(r.isNotNull, refCase),
      when(v.getField("list").isNotNull, array_join(v.getField("list"), ", ")),
      v.getField("json"),
      lit(""))
  }

  /** S3 comments lookup ≙ `get_comments` (services/tracker.py:46-48).
    * The reference fetches one issue's comments over HTTP and returns the
    * API objects untransformed; the engine-side analog is the flat
    * comment relation derived from the nested document — a per-issue
    * lookup composes as a pushdown-friendly `issue_key` filter on top
    * (see `pipeline_comments`). Author resolution and null handling
    * follow the changelog actor rules (email lowered, name fallback).
    */
  def comments(raw: DataFrame): DataFrame =
    raw
      .select(col("key").as("issue_key"), explode(col("comments")).as("c"))
      .select(
        col("issue_key"),
        col("c.id").as("comment_id"),
        col("c.text").as("text"),
        coalesce(low(col("c.createdBy.email")), low(col("c.createdBy.name")), lit("")).as("author"),
        parseDt(col("c.createdAt")).as("created_at"),
        parseDt(col("c.updatedAt")).as("updated_at"))

  /** Changelog rows ≙ issues_changelog DDL (models/issue.py:126-160):
    * every event × changed field, P8-filtered (non-null field, at least one
    * non-empty side), values stringified per F9.
    */
  def changelog(raw: DataFrame, version: Column = current_timestamp()): DataFrame =
    raw
      .select(
        col("key").as("issue_key"),
        col("queue.key").as("queue"),
        explode(col("changelog")).as("ev"))
      .select(
        col("issue_key"), col("queue"),
        parseDt(col("ev.updatedAt")).as("event_time"),
        col("ev.type").as("event_type"),
        col("ev.transport").as("transport"),
        coalesce(low(col("ev.updatedBy.email")), low(col("ev.updatedBy.name")), lit("")).as("actor"),
        explode(col("ev.fields")).as("change"))
      .select(
        col("issue_key"), col("queue"), col("event_time"), col("event_type"),
        col("transport"), col("actor"),
        coalesce(col("change.field.name"), col("change.field.id")).as("changed_field"),
        stringifyVariant(col("change.from")).as("changed_from"),
        stringifyVariant(col("change.to")).as("changed_to"))
      .where(col("changed_field").isNotNull && (col("changed_from") =!= "" || col("changed_to") =!= ""))
      .select(
        version.as("version"), col("event_time"), col("issue_key"), col("queue"),
        col("event_type"), col("transport"), col("actor"), col("changed_field"),
        col("changed_from"), col("changed_to"))
}
