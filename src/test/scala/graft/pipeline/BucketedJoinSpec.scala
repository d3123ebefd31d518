package graft.pipeline

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.PipelineFixture

/** Proves the SCALING.md bucketing claim: writing the pipeline tables
  * bucketed by `issue_key` makes the issues⋈metrics join exchange-free
  * (both sides pre-partitioned on the join key — at 100 TB this deletes
  * the dominant shuffle of every downstream readback).
  */
class BucketedJoinSpec extends SparkSuite {

  test("issues join metrics over bucketed tables plans no Exchange") {
    // (warehouse dir is a static conf; tables land in ./spark-warehouse
    // and DROP TABLE below removes the managed files)
    val savedThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the non-broadcast path
    try {
      val p = IssuePipeline.transform(PipelineFixture.raw(spark),
        version = lit("2024-01-01 00:00:00").cast("timestamp"))
      p.issues.write.mode("overwrite")
        .bucketBy(4, "issue_key").sortBy("issue_key").saveAsTable("b_issues")
      p.metrics.write.mode("overwrite")
        .bucketBy(4, "issue_key").sortBy("issue_key").saveAsTable("b_metrics")

      val joined = spark.table("b_issues").join(spark.table("b_metrics"), "issue_key")
        .where(col("status_name") === "in_progress")
        .select(col("issue_key"), col("status"), col("duration"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"expected exchange-free bucketed join, got:\n$plan")
      assert(joined.count() == 1) // TEST-1 has an in_progress metric row
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_issues")
      spark.sql("DROP TABLE IF EXISTS b_metrics")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", savedThreshold)
    }
  }
}
