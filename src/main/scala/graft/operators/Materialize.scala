package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Reuse-point materialization policy for multi-consumer intermediates.
  *
  * Operators that feed one intermediate DataFrame to several consumers
  * (a tokenization shared by a model fit and a scoring pass, a gated
  * corpus feeding both sides of an anti-join) must cut the plan once,
  * or every consumer replays the whole upstream subtree. Rounds 1-8
  * used `localCheckpoint(false)` for this, which has the right reuse
  * shape but the wrong failure mode at cluster scale: it truncates
  * lineage AND keeps the blocks on executor-local storage only, so one
  * lost executor fails the job unrecoverably. The default here is
  * `persist(MEMORY_AND_DISK)`: blocks are still computed once and
  * reused by every consumer, but lineage survives, so an executor loss
  * recomputes the lost partitions instead of killing the run.
  *
  * Knob: `spark.graft.materialize` =
  *   - `persist` (default) — `persist(MEMORY_AND_DISK)`, lineage kept;
  *   - `localCheckpoint` — the pre-round-9 behavior (marginally cheaper
  *     on a single-JVM `local[n]` master where executor loss cannot
  *     happen, and frees its blocks by GC instead of cache pinning);
  *   - `none` — no cut at all (plan-shape debugging only; shared
  *     subtrees re-execute per consumer).
  *
  * Persisted blocks are pinned by the session's cache manager until
  * `spark.catalog.clearCache()` or `unpersist()`; `Bench` and `Verify`
  * clear between queries so a 100-query run does not accumulate blocks.
  */
object Materialize {
  private def policy(df: DataFrame): String = {
    val v = df.sparkSession.conf.get("spark.graft.materialize", "persist")
    v match {
      case "persist" | "localCheckpoint" | "none" => v
      // fail loudly: a typo ("localcheckpoint") silently mapping to the
      // default would make misconfiguration invisible
      case other => throw new IllegalArgumentException(
        s"spark.graft.materialize=$other (expected persist|localCheckpoint|none)")
    }
  }

  def cut(df: DataFrame): DataFrame =
    policy(df) match {
      case "localCheckpoint" => df.localCheckpoint(eager = false)
      case "none"            => df
      case _                 => df.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Eager cut — where `.localCheckpoint(true)` used to be: the caller
    * needs the blocks computed NOW (e.g. a bounded probe about to be
    * collected, or a loop iteration whose lineage must not stack).
    * Under the default persist policy that is `persist` + a `count()`
    * action to force population; lineage survives executor loss.
    */
  def cutEager(df: DataFrame): DataFrame =
    policy(df) match {
      case "localCheckpoint" => df.localCheckpoint(eager = true)
      case "none"            => df
      case _ =>
        val p = df.persist(StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
    }

  /** `.materialized` chains where `.localCheckpoint(false)` used to. */
  implicit class MatOps(private val df: DataFrame) extends AnyVal {
    def materialized: DataFrame = Materialize.cut(df)
    def materializedEager: DataFrame = Materialize.cutEager(df)
  }
}
