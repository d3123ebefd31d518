package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.pipeline.IssuePipeline
import graft.queries.PipelineFixture

class ClickHouseDDLSpec extends SparkSuite {

  test("migrations derive from real transform output schemas") {
    val p = IssuePipeline.transform(PipelineFixture.raw(spark),
      version = lit("2024-01-01 00:00:00").cast("timestamp"))
    val ddls = ClickHouseDDL.migrations("agile",
      Map("issues" -> p.issues.schema, "issue_metrics" -> p.metrics.schema,
        "issues_changelog" -> p.changelog.schema),
      IssuePipeline.sortKeys)
    assert(ddls.size == 6) // 3 tables + 3 FINAL views
    val issues = ddls.find(_.contains("agile.issues (")).get
    assert(issues.contains("ENGINE = ReplacingMergeTree(version)"))
    assert(issues.contains("ORDER BY (issue_key)"))
    assert(issues.contains("`tags` Array(String)"))
    assert(issues.contains("`is_closed` Nullable(UInt8)") || issues.contains("`is_closed` UInt8"))
    assert(issues.contains("`story_points` Nullable(Float32)") || issues.contains("`story_points` Float32"))
    assert(issues.contains("`created_at` DateTime64(3, 'UTC')"))
    assert(issues.contains("`deadline` Date"))
    val metrics = ddls.find(_.contains("agile.issue_metrics (")).get
    assert(metrics.contains("ORDER BY (issue_key, status_name, last_seen)"))
    assert(metrics.contains("`duration` Nullable(Int64)") || metrics.contains("`duration` Int64"))
    assert(ddls.count(_.contains("FINAL")) == 3)
  }
}
