package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed fact keys against an UNBROADCASTABLE
  * dimension — the manual fallback when both of Spark's first-line
  * answers are unavailable: `broadcast()` needs the dim to fit an
  * executor, and AQE's `OptimizeSkewedJoin` only splits a skewed
  * partition when the join is a plain sort-merge whose runtime stats it
  * can see (it cannot help a join keyed so hot that ONE key exceeds a
  * partition — splitting a partition cannot split a key).
  *
  * The classic remedy: append `salt = hash(tie) mod factor` to the fact
  * side (a deterministic spread of each key's rows over `factor`
  * sub-keys — any per-row column works as the tie; a unique id gives
  * the most uniform spread), replicate the dimension `factor`× with
  * every salt value, and join on `(keys…, salt)`. The hottest key's
  * rows now land in `factor` different reducer tasks instead of one.
  * Cost: the dim side shuffles `factor`× its size — which is why
  * `factor` should be sized to the worst key's excess, not maxed out.
  * Result set is EXACTLY the plain inner join's (asserted in
  * SkewJoinSpec and by the driver's `skew_join` oracle): salting only
  * refines the partitioning key, every (fact row, dim row) match pair
  * still meets in exactly one (key, salt) bucket.
  */
object SkewJoin {

  /** Inner-join `fact` to `dim` on `keys`, spreading each fact key's
    * rows over `factor` salt buckets keyed by `hash(tie) mod factor`.
    * `dim` must be unique per `keys` combination in the usual
    * dimensional sense (the operator does not require it, but the
    * replication multiplies duplicates like the plain join would).
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
                 tie: org.apache.spark.sql.Column, factor: Int): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    require(factor >= 1, s"salt factor must be >= 1, got $factor")
    val salted = fact.withColumn("_salt", pmod(hash(tie), lit(factor)))
    val replicated = dim.withColumn("_salt", explode(sequence(lit(0), lit(factor - 1))))
    salted.join(replicated, keys :+ "_salt").drop("_salt")
  }

  /** Stats-driven join strategy — the decision a planner-aware pipeline
    * makes EXPLICITLY instead of trusting defaults at 100 TB: broadcast
    * the dim when Catalyst's size estimate fits the given budget
    * (`broadcast()` hint — no shuffle of the fact side at all); when it
    * doesn't fit AND a skew spec is supplied, run the salted join (AQE
    * cannot split a single hot KEY, only a hot partition); otherwise a
    * plain shuffle join, where AQE's runtime re-plan still applies.
    * The estimate is `optimizedPlan.stats.sizeInBytes` — the same
    * number `spark.sql.autoBroadcastJoinThreshold` consults, read here
    * so the choice is visible, testable, and overridable per call
    * rather than buried in a session-global conf.
    */
  def autoJoin(fact: DataFrame, dim: DataFrame, keys: Seq[String],
               broadcastBytes: Long = 10L << 20,
               skew: Option[(org.apache.spark.sql.Column, Int)] = None): DataFrame = {
    require(keys.nonEmpty, "at least one join key")
    val dimBytes = dim.queryExecution.optimizedPlan.stats.sizeInBytes
    if (dimBytes <= broadcastBytes) fact.join(broadcast(dim), keys)
    else skew match {
      case Some((tie, factor)) => saltedJoin(fact, dim, keys, tie, factor)
      case None                => fact.join(dim, keys)
    }
  }

  /** Join-key skew profile — the measurement that decides whether
    * [[saltedJoin]] (or AQE skew handling) is needed BEFORE a 100 TB
    * join is launched: per prospective key, how unevenly does row mass
    * distribute? `skew_factor` = max_key_count · n_keys / n_rows (1.0 =
    * perfectly uniform; a factor of 50 means the hottest key holds 50×
    * its fair share — the single-task straggler signature). Emits the
    * `topK` heavy hitters, each row also carrying the global stats
    * (n_rows, n_keys, skew_factor) and the hitter's share.
    *
    * All counts exact int64; share and factor are single IEEE divisions.
    * Plan: ONE map-side-combined key count (the same exchange the real
    * join would pay on its smaller side), a 1-row global aggregate, a
    * TakeOrdered top-k, one broadcast cross join of the 1-row stats.
    */
  def keySkewProfile(df: DataFrame, keyCol: String, topK: Int = 5): DataFrame = {
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    val stats = counts.agg(
      sum(col("cnt")).as("n_rows"), count(lit(1)).as("n_keys"), max(col("cnt")).as("_mx"))
    counts.orderBy(col("cnt").desc, col(keyCol)).limit(topK)
      .crossJoin(broadcast(stats))
      .select(col(keyCol), col("cnt"),
        (col("cnt").cast("double") / col("n_rows").cast("double")).as("share"),
        col("n_rows"), col("n_keys"),
        ((col("_mx") * col("n_keys")).cast("double") / col("n_rows").cast("double"))
          .as("skew_factor"))
      .orderBy(col("cnt").desc, col(keyCol))
  }
}
