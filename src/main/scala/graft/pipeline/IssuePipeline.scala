package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.TimeFns
import graft.operators.Dedup
import graft.schema.EngineConfig
import graft.sinks.Sink
import graft.state.StateStore
import graft.transform.IssueTransform

/** Pipeline orchestration ≙ YandexTrackerETL.run (etl.py:202-264):
  * watermark-bounded scan → transform into three tables → latest-version
  * dedup → sinks → commit watermark only after every write succeeded
  * (:242-256). Re-runs are idempotent because dedup is an explicit
  * operator on the DDL sort keys (replacing ReplacingMergeTree +
  * `OPTIMIZE FINAL`, S7/A4).
  */
object IssuePipeline {

  final case class Payload(issues: DataFrame, metrics: DataFrame, changelog: DataFrame) {
    /** Typed `Dataset[T]` view (by-name conversion: column order is
      * irrelevant, U1 extension columns are dropped) for consumers that
      * want compile-time field access over the three tables.
      */
    def typed: TypedPayload = {
      val spark = issues.sparkSession
      import spark.implicits._
      TypedPayload(
        issues.as[graft.schema.IssueRow],
        metrics.as[graft.schema.MetricRow],
        changelog.as[graft.schema.ChangelogRow])
    }
  }

  final case class TypedPayload(
      issues: org.apache.spark.sql.Dataset[graft.schema.IssueRow],
      metrics: org.apache.spark.sql.Dataset[graft.schema.MetricRow],
      changelog: org.apache.spark.sql.Dataset[graft.schema.ChangelogRow])

  /** Run statistics ≙ A5/P10 (etl.py:155-190): processed counts plus the
    * count of issues whose changelog yielded no metric rows (they still
    * load an issue row; reference etl.py:173-177).
    */
  final case class RunStats(
      issuesProcessed: Long,
      metricsRows: Long,
      changelogRows: Long,
      issuesWithoutMetrics: Long,
      newWatermark: Option[String],
      uploaded: Boolean)

  /** DDL sort keys (migrations/clickhouse/000001..000003 ORDER BY) —
    * the dedup identity of each table; `version` picks the survivor.
    */
  val sortKeys: Map[String, Seq[String]] = Map(
    "issues" -> Seq("issue_key"),
    "issue_metrics" -> Seq("issue_key", "status_name", "last_seen"),
    "issues_changelog" -> Seq("issue_key", "event_time", "event_type", "changed_field"))

  def transform(raw: DataFrame, cfg: EngineConfig = EngineConfig(),
                version: Column = current_timestamp()): Payload = {
    val wf = IssueTransform.workflowEvents(raw, cfg)
    Payload(
      issues = IssueTransform.issues(raw, cfg, version),
      metrics = IssueTransform.metrics(wf, version),
      changelog =
        if (cfg.changelogExportEnabled) IssueTransform.changelog(raw, version)
        else IssueTransform.changelog(raw.limit(0), version))
  }

  /** Latest-version dedup per table on its DDL sort key (A4). */
  def dedup(p: Payload): Payload = Payload(
    issues = Dedup.latestByKey(p.issues, sortKeys("issues"), Seq("version")),
    metrics = Dedup.latestByKey(p.metrics, sortKeys("issue_metrics"), Seq("version")),
    changelog = Dedup.latestByKey(p.changelog, sortKeys("issues_changelog"), Seq("version")))

  /** Compile the scan predicate with the reference's three-way precedence
    * (etl.py:66-111, `_build_search_query`):
    *
    *   1. explicit search query — overrides everything ("Search query
    *      received, ignoring other filter params");
    *   2. stateful — `Updated > watermark`; on the FIRST run (no
    *      committed watermark) fall back to `now − statefulInitialRange`
    *      (reference default 1w, config.py:187), so a fresh deployment
    *      backfills a bounded window instead of the whole history. A
    *      configured queue list also applies in this arm (etl.py:85);
    *   3. sliding window — queue filter and/or `Updated >= now − range`
    *      (reference range default 2h, config.py:84).
    *
    * Returns None for an unbounded full scan — the library default when
    * nothing is configured (the reference CLI raises ConfigurationError
    * instead, etl.py:108-110: a service polling a live API must be
    * bounded; a library scanning a finite source need not be).
    *
    * Comparisons happen on PARSED timestamps, not wire strings — see the
    * watermark note in [[run]]. The function-of-column predicate
    * evaluates inside the scan's codegen stage (not as a parquet
    * PushedFilter); at 100 TB raw documents land date-partitioned and
    * the same bound prunes partitions via the partition column.
    */
  def scanFilter(cfg: EngineConfig, watermark: Option[String],
                 now: java.time.Instant = java.time.Instant.now()): Option[Column] = {
    val updatedTs = TimeFns.parseTrackerDatetime(col("updatedAt"))
    def since(range: String): Column =
      updatedTs >= lit(java.sql.Timestamp.from(
        now.minusSeconds(TimeFns.fromHumanTime(range)))).cast("timestamp")
    val queueFilter: Option[Column] =
      if (cfg.search.queues.nonEmpty) Some(col("queue.key").isInCollection(cfg.search.queues))
      else None
    cfg.search.query match {
      case Some(q) => Some(expr(q))
      case None if cfg.stateful || watermark.isDefined =>
        val bound = watermark match {
          case Some(w) => Some(updatedTs > TimeFns.parseTrackerDatetime(lit(w)))
          case None => cfg.statefulInitialRange.map(since)
        }
        (queueFilter.toSeq ++ bound.toSeq).reduceOption(_ && _)
      case None if queueFilter.isDefined || cfg.search.range.isDefined =>
        (queueFilter.toSeq ++ cfg.search.range.map(since).toSeq).reduceOption(_ && _)
      case None => None
    }
  }

  /** One scheduled micro-batch. `source` is the full raw-issue corpus;
    * stateful mode filters it above the committed watermark
    * (etl.py:80-89), transforms, writes the three tables, and commits the
    * new watermark only after all writes succeed (etl.py:242-256).
    */
  def run(source: DataFrame,
          cfg: EngineConfig = EngineConfig(),
          sink: Sink,
          state: Option[StateStore] = None,
          stateKey: String = "last_update_at",
          version: Column = null,
          now: java.time.Instant = java.time.Instant.now()): RunStats = {

    // Bind version ONCE driver-side: current_timestamp() is query-constant
    // but not action-constant, so a per-action default would stamp the
    // three tables with three different versions within one run.
    val ver = Option(version).getOrElse(
      lit(new java.sql.Timestamp(System.currentTimeMillis())).cast("timestamp"))

    // Watermark comparison happens on PARSED timestamps, not wire strings:
    // ISO-8601 strings with mixed UTC offsets do not sort chronologically
    // as text ('...16:30+0000' < '...18:00+0300' lexicographically even
    // though it is the later instant).
    val watermark = state.flatMap(_.get(stateKey))
    val updatedTs = TimeFns.parseTrackerDatetime(col("updatedAt"))
    val bounded = scanFilter(cfg, watermark, now)
      .map(source.where).getOrElse(source)
      .cache() // read once: counts, transform, and the watermark agg share it

    try {
      // Early exit: nothing to export (etl.py:143-145).
      val nIssues = bounded.count()
      if (nIssues == 0) return RunStats(0, 0, 0, 0, watermark, uploaded = false)

      val payload = dedup(transform(bounded, cfg, ver))
      val nMetrics = payload.metrics.count()
      val nChangelog = payload.changelog.count()
      // P10: distinct issues that produced no metric rows (empty/filtered
      // changelog) — distinct on both sides so a window holding several
      // versions of one issue is not overcounted.
      val nDistinctIssues = bounded.select(col("key")).distinct().count()
      val nWithoutMetrics = nDistinctIssues - payload.metrics.select("issue_key").distinct().count()

      sink.write(payload.issues, "issues")
      sink.write(payload.metrics, "issue_metrics")
      sink.write(payload.changelog, "issues_changelog")

      // Commit-after-write ordering: the watermark moves only once every
      // table landed, so a failed run re-reads the same window and dedup
      // collapses the duplicates (exactly the reference's tolerance level).
      // The committed value is the wire string of the chronologically max
      // updatedAt (null-guarded: an all-null window commits nothing).
      val newWm = bounded
        .agg(max_by(col("updatedAt"), updatedTs).as("wm"))
        .collect()(0).getString(0)
      Option(newWm).foreach(w => state.foreach(_.set(stateKey, w)))
      RunStats(nIssues, nMetrics, nChangelog, nWithoutMetrics, Option(newWm).orElse(watermark), uploaded = true)
    } finally bounded.unpersist()
  }
}
