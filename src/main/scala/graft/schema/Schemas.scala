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

/** Engine configuration ≙ the reference's Settings relevant to the
  * transform (config.py:188-214) + the business calendar
  * (config.py:193-195).
  */
final case class EngineConfig(
    closedStatuses: Set[String] = Set("closed", "rejected", "resolved", "cancelled", "released"),
    changelogExportEnabled: Boolean = true,
    calendar: BusinessTime.Calendar = BusinessTime.Calendar())
