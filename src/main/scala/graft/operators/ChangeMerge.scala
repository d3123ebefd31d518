package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (SCD1 upsert): apply a change feed of upserts and deletes
  * to a snapshot — the table-maintenance primitive behind every
  * incremental corpus refresh (Delta/Iceberg `MERGE INTO`, expressed as
  * a plain full-outer join so it runs on bare parquet).
  */
object ChangeMerge {

  /** Apply `changes` (`keyCol`, `opCol` ∈ {"upsert", "delete"}, `seqCol`
    * — a monotone change-sequence number, `payloadCols`) to `snapshot`
    * (`keyCol`, `payloadCols`). Multiple changes per key collapse to
    * the HIGHEST `seqCol` first (exact `max_by(struct)` — the A4
    * last-write-wins rule), then one full-outer join merges:
    *
    *   - latest change is an upsert   → the change's payload wins
    *     (whether or not the key existed);
    *   - latest change is a delete    → the key is dropped;
    *   - no change for the key        → the snapshot row passes through.
    *
    * Emits `keyCol`, the payload columns, and `merge_action` ∈
    * {"kept", "updated", "inserted"} for the refresh audit.
    *
    * Plan: one map-side-combined max_by aggregate collapses the feed to
    * one row per changed key, then ONE shuffle join on the key (change
    * feeds are usually small → AQE broadcasts the collapsed side). No
    * window over the snapshot, no sort — at 100 TB the snapshot moves
    * through exactly one exchange, and with both sides bucketed by key
    * on disk, none.
    */
  def applyChanges(snapshot: DataFrame, changes: DataFrame, keyCol: String,
                   opCol: String, seqCol: String,
                   payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "at least one payload column required")
    val latest = changes
      .groupBy(col(keyCol))
      .agg(max_by(
        struct(col(opCol).as("_op") +: payloadCols.map(c => col(c).as(c)): _*),
        col(seqCol)).as("_ch"))
      .select(col(keyCol), col("_ch.*"))
    val snap = snapshot.select(
      col(keyCol) +: lit(true).as("_in_snap") +: payloadCols.map(c => col(c).as(s"_s_$c")): _*)
    snap.join(latest, Seq(keyCol), "full_outer")
      .where(coalesce(col("_op") =!= "delete", lit(true))) // delete rows drop
      .select(
        Seq(col(keyCol)) ++
          payloadCols.map(c => when(col("_op") === "upsert", col(c))
            .otherwise(col(s"_s_$c")).as(c)) :+
          when(col("_op").isNull, lit("kept"))
            .when(coalesce(col("_in_snap"), lit(false)), lit("updated"))
            .otherwise(lit("inserted")).as("merge_action"): _*)
  }

  /** Incremental aggregate maintenance: merge partial rollup snapshots
    * (same key columns, same mergeable stats) by re-aggregating — the
    * materialized-view refresh primitive. A 100 TB pipeline never
    * recomputes its daily rollup from raw history; it keeps the stored
    * BASE aggregate and folds in each arriving partition's DELTA
    * aggregate. Correct exactly when every stat is a commutative
    * monoid under the merge used here: counts and sums re-sum, mins
    * re-min, maxes re-max. (Averages must be carried as sum+count;
    * distincts as mergeable sketches — [[graft.plans.KmvSketchAggregate]]
    * / [[graft.plans.HllSketchAggregate]] exist for exactly that.)
    *
    * Plan: one union (no shuffle) + one map-side-combined aggregate
    * whose input is ALREADY rollup-sized — cost is proportional to the
    * rollup cardinality, independent of raw history volume.
    */
  def mergeRollups(parts: Seq[DataFrame], keys: Seq[String],
                   sumCols: Seq[String], minCols: Seq[String] = Nil,
                   maxCols: Seq[String] = Nil): DataFrame = {
    require(parts.nonEmpty, "at least one rollup part required")
    require(sumCols.nonEmpty || minCols.nonEmpty || maxCols.nonEmpty,
      "at least one stat column required")
    val unioned = parts.reduce(_.unionByName(_))
    val aggs = sumCols.map(c => sum(col(c)).as(c)) ++
      minCols.map(c => min(col(c)).as(c)) ++
      maxCols.map(c => max(col(c)).as(c))
    unioned.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }
}
