package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time (as-of) join — "the most recent right row at or before
  * each left row's timestamp", the operator behind feature lookups,
  * state-at-event-time enrichment, and trade/quote alignment. Spark has
  * no native form (SPARK-22947): a naive theta-join
  * `l.key = r.key AND l.ts >= r.ts` explodes to the full per-key history
  * before a groupBy picks the max — O(|L|·|R|) per key.
  *
  * Spark-first re-expression as the MERGE shape the operator really is:
  * both sides UNION into one stream (right rows carry their payload as
  * one struct, left rows a null), ONE hash exchange on the key, one
  * per-key time sort, and a running `last(payload, ignoreNulls)` window
  * carries the latest right payload forward into every left row. Right
  * rows order BEFORE left rows at equal timestamps, so the semantics are
  * inclusive (`>=`) — matching DuckDB's native ASOF JOIN, which the
  * driver oracle uses. The payload travels as a single struct so all its
  * fields come from the SAME right row (per-column carry-forward could
  * stitch different rows when payload fields are null); ties on
  * (ts, side) break on the payload struct itself, so the result is
  * deterministic even with duplicate right timestamps.
  *
  * Scale: one shuffle per side, the window parallelizes per key, no
  * row-count amplification at any point. A pathologically hot key is the
  * standard window-skew story: pre-aggregate right to per-(key, bucket)
  * last rows, carry bucket boundaries forward, then window inside
  * buckets — composable in front of this operator without changing its
  * contract.
  */
object AsOfJoin {

  /** Left as-of join. Returns every `left` row plus `prefix`-renamed
    * copies of `rightPayload` columns from the latest `right` row with
    * the same `keys` and `right.tsCol <= left.tsCol` (null when no such
    * row exists).
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("_t"),
        lit(0).as("_side"),
        struct(rightPayload.map(col): _*).as("_rp")): _*)
    val l = left
      .withColumn("_t", col(leftTs).cast("timestamp"))
      .withColumn("_side", lit(1))
    val unioned = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t"), col("_side"), col("_rp"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("_filled", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(col) ++
        rightPayload.map(c => col(s"_filled.$c").as(prefix + c)): _*)
  }
}
