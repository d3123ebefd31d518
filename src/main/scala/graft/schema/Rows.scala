package graft.schema

import java.sql.{Date, Timestamp}

/** Typed output rows — the `Dataset[T]` face of the three flat tables
  * (≙ the ClickHouse DDLs, migrations/clickhouse/000001..000003). The
  * transform layer works in `DataFrame`s (schema is driven by the DDL and
  * U1 extension columns can be appended dynamically); these encoders are
  * for consumers that want compile-time field access — conversion is
  * by-name via `.as[T]`, so column order is irrelevant and U1 extras are
  * simply dropped.
  */
final case class IssueRow(
    version: Option[Timestamp],
    queue: String,
    title: Option[String],
    issue_key: String,
    issue_type: Option[String],
    priority: Option[String],
    status: Option[String],
    resolution: Option[String],
    assignee: Option[String],
    author: Option[String],
    qa_engineer: Option[String],
    tags: Seq[String],
    components: Seq[String],
    project: Option[String],
    created_at: Option[Timestamp],
    updated_at: Option[Timestamp],
    deadline: Option[Date],
    closed_at: Option[Timestamp],
    resolved_at: Option[Timestamp],
    start_date: Option[Date],
    end_date: Option[Date],
    is_subtask: Boolean,
    is_closed: Boolean,
    is_resolved: Boolean,
    story_points: Float,
    sprints: Seq[String],
    parent_issue_key: Option[String],
    epic_issue_key: Option[String],
    aliases: Seq[String],
    was_moved: Boolean,
    moved_at: Option[Timestamp],
    moved_by: Option[String])

final case class MetricRow(
    version: Option[Timestamp],
    last_seen: Timestamp,
    issue_key: String,
    status_name: String,
    status_transitions_count: Int,
    duration: Long,
    human_readable_duration: String,
    busdays_duration: Long,
    human_readable_busdays_duration: String)

final case class ChangelogRow(
    version: Option[Timestamp],
    event_time: Option[Timestamp], // null when the wire datetime is unparseable
    issue_key: String,
    queue: String,
    event_type: String,
    transport: Option[String],
    actor: String,
    changed_field: String,
    changed_from: String,
    changed_to: String)
