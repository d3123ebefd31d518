package graft.schema

import org.apache.spark.sql.types._

import graft.functions.BusinessTime

/** Schemas and engine configuration.
  *
  * `rawIssue` mirrors the nested source-document shape the reference
  * consumes (reference models/issue.py:74-124 field access, :126-224
  * changelog; spec in /root/repo/FIXTURES.md §1). The flat output schemas
  * (≙ the three ClickHouse DDLs, migrations/clickhouse/000001..000003)
  * are produced by graft.transform and carried as DataFrames — typed
  * timestamps/dates/booleans instead of the reference's all-strings wire
  * format (SURVEY.md §1.2).
  */
object Schemas {

  private def field(n: String, t: DataType = StringType) = StructField(n, t)

  /** Heterogeneous changelog `from`/`to` values (string / number /
    * object-reference / list / pre-serialized JSON), encoded as a variant
    * struct with exactly one non-null member (FIXTURES.md §1).
    */
  val variant: StructType = StructType(Seq(
    field("s"),
    field("n", DoubleType),
    field("ref", StructType(Seq(field("key"), field("email"), field("name"), field("id")))),
    field("list", ArrayType(StringType)),
    field("json")))

  val fieldChange: StructType = StructType(Seq(
    field("field", StructType(Seq(field("id"), field("name")))),
    field("from", variant),
    field("to", variant)))

  val changelogEvent: StructType = StructType(Seq(
    field("updatedAt"),
    field("type"),
    field("transport"),
    field("updatedBy", StructType(Seq(field("email"), field("name")))),
    field("fields", ArrayType(fieldChange))))

  /** Issue comment ≙ the API objects `get_comments` returns
    * (services/tracker.py:46-48; nested per issue on the wire).
    */
  val comment: StructType = StructType(Seq(
    field("id"),
    field("text"),
    field("createdBy", StructType(Seq(field("email"), field("name")))),
    field("createdAt"),
    field("updatedAt")))

  private def ref(attr: String) = StructType(Seq(field(attr)))

  val rawIssue: StructType = StructType(Seq(
    field("key"),
    field("summary"),
    field("queue", ref("key")),
    field("type", ref("name")),
    field("priority", ref("name")),
    field("status", ref("name")),
    field("resolution", ref("name")),
    field("assignee", ref("email")),
    field("createdBy", ref("email")),
    field("qaEngineer", ref("email")),
    field("parent", ref("key")),
    field("epic", ref("key")),
    field("project", ref("name")),
    field("sprint", ArrayType(ref("name"))),
    field("components", ArrayType(ref("name"))),
    field("tags", ArrayType(StringType)),
    field("aliases", ArrayType(StringType)),
    field("storyPoints", FloatType),
    field("createdAt"),
    field("updatedAt"),
    field("resolvedAt"),
    field("start"),
    field("end"),
    field("deadline"),
    field("changelog", ArrayType(changelogEvent)),
    field("comments", ArrayType(comment))))
}

/** Search & export settings ≙ IssuesSearchSettings (config.py:80-100):
  * the inputs of the three-way scan-mode precedence (etl.py:66-111).
  * `query` is re-expressed Spark-first as a SQL boolean expression over
  * the raw document (the reference's is a Yandex Tracker query-language
  * string bound to the REST API — same role: an explicit scan predicate
  * that overrides every other filter).
  */
final case class SearchSettings(
    query: Option[String] = None,
    range: Option[String] = None,
    queues: Seq[String] = Nil)

/** Engine configuration ≙ the reference's Settings relevant to the
  * transform (config.py:188-214), the business calendar
  * (config.py:193-195), and the scan mode (config.py:80-100, :186-187).
  *
  * Plain-constructor defaults keep the engine's library behavior
  * (unbounded scan, changelog on); [[EngineConfig.fromEnv]] applies the
  * reference's DEPLOYMENT defaults (sliding 2h window, 1w stateful
  * initial range) for a drop-in `EXPORTER_*` environment.
  */
final case class EngineConfig(
    closedStatuses: Set[String] = Set("closed", "rejected", "resolved", "cancelled", "released"),
    changelogExportEnabled: Boolean = true,
    calendar: BusinessTime.Calendar = BusinessTime.Calendar(),
    search: SearchSettings = SearchSettings(),
    stateful: Boolean = false,
    statefulInitialRange: Option[String] = None,
    etlIntervalMinutes: Int = 30)

object EngineConfig {

  /** Bind the reference's environment surface (`EXPORTER_*`, nested keys
    * with `__` — config.py:246-250) into an [[EngineConfig]]. Only the
    * settings the ENGINE consumes are bound; client/deployment settings
    * (tokens, retries, ClickHouse endpoints, monitoring hosts) belong to
    * the caller that owns those components. Unset vars take the
    * reference's defaults (config.py:84, :179-214): search range "2h",
    * stateful initial range "1w", Mon–Fri 09:00–22:00.
    *
    * Deliberate deviation: `changelog_export_enabled` defaults ON here
    * (the changelog table is a first-class engine output; the reference
    * defaults it off) — set EXPORTER_CHANGELOG_EXPORT_ENABLED=false for
    * reference behavior. The reference's timezone knobs are not bound:
    * this engine carries typed UTC timestamps end-to-end instead of
    * formatting naive strings per timezone (SURVEY.md §1.2).
    */
  /** Invalid env values fail with the variable NAME in the message (the
    * reference's ConfigurationError discipline, config.py:216-223) —
    * a bare NumberFormatException from deployment config is a support
    * ticket, not an error message.
    */
  private def configError(key: String, value: String, want: String): Nothing =
    throw new IllegalArgumentException(
      s"invalid $key='$value' — expected $want")

  def fromEnv(env: Map[String, String] = sys.env): EngineConfig = {
    def get(k: String): Option[String] = env.get(k).map(_.trim).filter(_.nonEmpty)
    def bool(k: String, dflt: Boolean): Boolean =
      get(k).map(_.toLowerCase match {
        case "1" | "true" | "yes" | "on"   => true
        case "0" | "false" | "no" | "off"  => false
        // a typo ('ture') must not silently mean false
        case v => configError(k, v, "a boolean (1/true/yes/on or 0/false/no/off)")
      }).getOrElse(dflt)
    // "9" or "09:00[:00]" → hour (the reference parses datetime.time)
    def hour(k: String, dflt: Int): Int =
      get(k).map { v =>
        val h = v.split(":")(0).toIntOption.getOrElse(configError(k, v, "an hour like 9 or 09:00"))
        if (h < 0 || h > 23) configError(k, v, "an hour in 0..23") else h
      }.getOrElse(dflt)
    val base = EngineConfig()
    val cal = base.calendar.copy(
      startHour = hour("EXPORTER_BUSINESS_HOURS_START", base.calendar.startHour),
      endHour = hour("EXPORTER_BUSINESS_HOURS_END", base.calendar.endHour),
      // reference workdays are Python weekday() ordinals, Monday = 0
      workDays = get("EXPORTER_WORKDAYS")
        .map(v => v.split(",").map { s =>
          s.trim.toIntOption.filter(d => d >= 0 && d <= 6)
            .map(d => java.time.DayOfWeek.of(d + 1))
            .getOrElse(configError("EXPORTER_WORKDAYS", v, "comma-separated weekday ordinals 0-6 (Monday=0)"))
        }.toSet)
        .getOrElse(base.calendar.workDays))
    EngineConfig(
      closedStatuses = get("EXPORTER_CLOSED_ISSUE_STATUSES")
        .map(_.split(",").map(_.trim.toLowerCase).toSet)
        .getOrElse(base.closedStatuses),
      changelogExportEnabled = bool("EXPORTER_CHANGELOG_EXPORT_ENABLED", dflt = true),
      calendar = cal,
      search = SearchSettings(
        query = get("EXPORTER_TRACKER__SEARCH__QUERY"),
        range = get("EXPORTER_TRACKER__SEARCH__RANGE").orElse(Some("2h")),
        // validate_queues uppercases (config.py:88-97)
        queues = get("EXPORTER_TRACKER__SEARCH__QUEUES")
          .map(_.split(",").map(_.trim.toUpperCase).toSeq).getOrElse(Nil)),
      stateful = bool("EXPORTER_STATEFUL", dflt = false),
      statefulInitialRange =
        get("EXPORTER_STATEFUL_INITIAL_RANGE").orElse(Some("1w")),
      // the scheduled-daemon cadence (config.py:200, default 30 min)
      etlIntervalMinutes = get("EXPORTER_ETL_INTERVAL_MINUTES")
        .map(v => v.toIntOption.filter(_ > 0)
          .getOrElse(configError("EXPORTER_ETL_INTERVAL_MINUTES", v, "a positive integer of minutes")))
        .getOrElse(30))
  }
}
