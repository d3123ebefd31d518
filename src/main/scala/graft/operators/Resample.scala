package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an irregular event stream onto a
  * fixed bucket grid with forward-fill — the feature-engineering step in
  * front of any model that wants one row per (key, interval)
  * ([[RateAnomaly.silentGaps]] DETECTS the holes; this FILLS them).
  */
object Resample {

  /** Per `keyCol`, bucket `tsCol` into `bucketSeconds` intervals, keep
    * the LAST observation per bucket (latest `(ts, tieCol)` — the
    * deterministic last-write-wins of A4), generate the full grid from
    * each key's first to last observed bucket, and forward-fill values
    * across empty buckets. Emits (`keyCol`, bucket_ts, `valueCol`,
    * is_gap) — `is_gap` true on carried-forward rows. The first bucket
    * of every key is observed by construction, so no row is null.
    *
    * Plan: one (key, bucket) max_by aggregate over the stream; the grid
    * is bounded by span/bucket per key (never event volume); the fill
    * is one running `last(ignoreNulls)` window on the key partitioning
    * the grid join already established. A key with a years-long span at
    * second grain makes a big grid — that is the operator's contract
    * (the output IS the grid); pick the bucket to match.
    */
  def forwardFill(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String, tieCol: String,
                  bucketSeconds: Long = 3600L): DataFrame = {
    require(bucketSeconds > 0, s"bucketSeconds must be positive, got $bucketSeconds")
    import Materialize.MatOps
    val us = bucketSeconds * 1000000L
    val obs = events
      .select(col(keyCol).as("_key"),
        expr(s"unix_micros($tsCol) div ${us}L").as("_b"),
        col(valueCol).as("_v"), col(tsCol).as("_ts"), col(tieCol).as("_tie"))
      .groupBy(col("_key"), col("_b"))
      .agg(max_by(col("_v"), struct(col("_ts"), col("_tie"))).as("_v"))
      .materialized // consumed by the span aggregate AND the grid join
    val grid = obs.groupBy(col("_key"))
      .agg(min(col("_b")).as("_b0"), max(col("_b")).as("_b1"))
      .select(col("_key"), explode(sequence(col("_b0"), col("_b1"))).as("_b"))
    val w = Window.partitionBy(col("_key")).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("_key", "_b"), "left")
      .select(col("_key").as(keyCol),
        timestamp_seconds(col("_b") * bucketSeconds).as("bucket_ts"),
        last(col("_v"), ignoreNulls = true).over(w).as(valueCol),
        col("_v").isNull.as("is_gap"))
  }
}
