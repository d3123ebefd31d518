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
  * (ts, side) break on `xxhash64` of the payload struct — a total order
  * up to 64-bit collision, sorting 8 bytes instead of the whole payload —
  * so the result is deterministic even with duplicate right timestamps.
  *
  * Null timestamps follow the SQL comparison contract the oracle
  * implements: a null-ts right row matches NOTHING (it is filtered before
  * the union — carrying it would poison every left row in its key, since
  * nulls sort first), and a null-ts left row gets a NULL payload (it
  * sorts, explicitly nulls-first, ahead of every surviving right row, so
  * the carry-forward window has nothing to fill it with).
  *
  * Scale: one shuffle per side, the window parallelizes per key, no
  * row-count amplification at any point. A pathologically hot key —
  * one key holding a large fraction of the right side, serializing its
  * window into a single task — takes the bucketed path
  * (`skewBucketSeconds`): per-(key, time-bucket) windows resolve
  * in-bucket matches in parallel, a per-(key, bucket) `max_by` hash
  * aggregate (map-side partial, so the hot key combines before the
  * exchange) reduces the right side to one last-row per bucket, and a
  * tiny per-key carry window over bucket summaries supplies the
  * cross-bucket fallback. Same contract, same results (asserted
  * result-identical in AsOfJoinSpec), parallelism = time-range /
  * bucket-width per key.
  */
object AsOfJoin {

  /** Left as-of join. Returns every `left` row plus `prefix`-renamed
    * copies of `rightPayload` columns from the latest `right` row with
    * the same `keys` and `right.tsCol <= left.tsCol` (null when no such
    * row exists; null timestamps never match — see object doc).
    *
    * @param skewBucketSeconds when set, route through the bucketed
    *   hot-key path: right history is summarized per
    *   (key, `skewBucketSeconds`-wide time bucket) so no single task
    *   ever sorts one key's full history. Result-identical to the
    *   default merge path; pick a width that puts ~10⁴–10⁶ rows per
    *   bucket for the hottest key.
    */
  def asOf(left: DataFrame, right: DataFrame, keys: Seq[String],
           leftTs: String, rightTs: String,
           rightPayload: Seq[String], prefix: String = "asof_",
           skewBucketSeconds: Option[Long] = None): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("_t"),
        lit(0).as("_side"),
        struct(rightPayload.map(col): _*).as("_rp")): _*)
      .where(col("_t").isNotNull) // null right ts matches nothing (object doc)
    val l = left
      .withColumn("_t", col(leftTs).cast("timestamp"))
      .withColumn("_side", lit(1))
    skewBucketSeconds match {
      case None => merged(l, r, left.columns, keys, rightPayload, prefix)
      case Some(sec) =>
        require(sec > 0, s"skewBucketSeconds must be positive, got $sec")
        bucketed(l, r, left.columns, keys, rightPayload, prefix, sec)
    }
  }

  /** FORWARD as-of join — pandas `merge_asof(direction="forward")`: for
    * every left row, the EARLIEST right row with the same `keys` and
    * `right.tsCol >= left.tsCol` (inclusive; null when the key's
    * history ends before the left timestamp). The
    * "next-touch" question — next click after a purchase, next
    * deploy after an alert — where [[asOf]] answers "most recent
    * state". Same merge shape mirrored: one union, one key exchange,
    * one `first(ignoreNulls)` window over the FOLLOWING frame; right
    * rows sort after left rows at an equal timestamp so the inclusive
    * match stays inside the frame. Ties among equal right timestamps
    * break by the same payload-hash total order as [[asOf]].
    */
  def asOfForward(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val r = right.select(
      keys.map(col) ++ Seq(
        col(rightTs).cast("timestamp").as("_t"),
        lit(2).as("_side"), // AFTER left (side 1) at equal ts — inclusive >=
        struct(rightPayload.map(col): _*).as("_rp")): _*)
      .where(col("_t").isNotNull)
    val l = left
      .withColumn("_t", col(leftTs).cast("timestamp"))
      .withColumn("_side", lit(1))
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc_nulls_last, col("_side"), xxhash64(col("_rp")))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_filled", first(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(left.columns.map(col).toSeq ++
        rightPayload.map(c => col(s"_filled.$c").as(prefix + c)): _*)
  }

  /** NEAREST as-of join — pandas `merge_asof(direction="nearest")`:
    * whichever of the backward ([[asOf]]) and forward ([[asOfForward]])
    * matches is closer in time wins; an exact time-distance TIE goes
    * BACKWARD (the already-observed state — the deterministic choice a
    * point-in-time semantics wants; pandas leaves the tie unspecified).
    * Implemented as both direction passes joined back on the left key
    * set — two merge windows instead of one, the honest cost of
    * needing both candidates; the pick itself is a row-local integer
    * microsecond comparison. `rightTs` must be in `rightPayload` (the
    * carried timestamp is what distances are measured against).
    */
  def asOfNearest(left: DataFrame, right: DataFrame, keys: Seq[String],
                  leftTs: String, rightTs: String,
                  rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightPayload.contains(rightTs),
      s"rightPayload must carry the right timestamp '$rightTs' for the distance compare")
    val back = asOf(left, right, keys, leftTs, rightTs, rightPayload, "_b_")
    val fwdCols = keys ++ Seq(leftTs) // join the forward pass back by the left identity
    require(left.columns.toSeq.intersect(fwdCols).size == fwdCols.size, "left must carry keys + ts")
    val fwd = asOfForward(left, right, keys, leftTs, rightTs, rightPayload, "_f_")
    val joined = back.join(fwd, left.columns.toSeq)
    val dBack = unix_micros(col(leftTs).cast("timestamp")) - unix_micros(col("_b_" + rightTs).cast("timestamp"))
    val dFwd = unix_micros(col("_f_" + rightTs).cast("timestamp")) - unix_micros(col(leftTs).cast("timestamp"))
    // backward wins on tie, on forward-missing, and when strictly closer
    val pickBack = col("_b_" + rightTs).isNotNull &&
      (col("_f_" + rightTs).isNull || dBack <= dFwd)
    rightPayload.foldLeft(joined) { (df, c) =>
      df.withColumn(prefix + c, when(pickBack, col("_b_" + c)).otherwise(col("_f_" + c)))
    }.select(left.columns.map(col).toSeq ++ rightPayload.map(c => col(prefix + c)): _*)
  }

  /** [[asOf]] with a STALENESS bound — pandas `merge_asof(tolerance=…)`:
    * a match older than `toleranceSeconds` before the left timestamp is
    * discarded (every `prefix`-payload column nulled), because a
    * feature-store value from last month is usually worse than no value
    * at all. `rightTs` must be in `rightPayload` (the carried timestamp
    * is what the bound is checked against — re-deriving it would re-sort
    * the history). The mask is a pure row-local projection over the
    * standard as-of output: exact integer microsecond arithmetic, no
    * extra shuffle, same plan shape and skew story as [[asOf]].
    */
  def asOfWithTolerance(left: DataFrame, right: DataFrame, keys: Seq[String],
                        leftTs: String, rightTs: String,
                        rightPayload: Seq[String], toleranceSeconds: Long,
                        prefix: String = "asof_",
                        skewBucketSeconds: Option[Long] = None): DataFrame = {
    require(toleranceSeconds >= 0, s"tolerance must be non-negative, got $toleranceSeconds")
    require(rightPayload.contains(rightTs),
      s"rightPayload must carry the right timestamp '$rightTs' for the staleness check")
    val joined = asOf(left, right, keys, leftTs, rightTs, rightPayload, prefix, skewBucketSeconds)
    val fresh = col(prefix + rightTs).isNotNull &&
      (unix_micros(col(leftTs).cast("timestamp")) - unix_micros(col(prefix + rightTs).cast("timestamp"))
        <= toleranceSeconds * 1000000L)
    rightPayload.foldLeft(joined) { (df, c) =>
      df.withColumn(prefix + c, when(fresh, col(prefix + c)))
    }
  }

  /** Default path: one union, one key exchange, one merge window. */
  private def merged(l: DataFrame, r: DataFrame, leftCols: Seq[String],
                     keys: Seq[String], rightPayload: Seq[String],
                     prefix: String): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col("_t").asc_nulls_first, col("_side"), xxhash64(col("_rp")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r, allowMissingColumns = true)
      .withColumn("_filled", last(col("_rp"), ignoreNulls = true).over(w))
      .where(col("_side") === 1)
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_filled.$c").as(prefix + c)): _*)
  }

  /** Hot-key path: per-(key, bucket) in-bucket merge windows + a
    * per-key carry window over one-row-per-bucket right summaries.
    * A left row's answer is its in-bucket fill when present, else the
    * last right payload of any STRICTLY EARLIER bucket (the carry);
    * both orderings use the same (ts, side, payload-hash) total order
    * as the merge path, so results are identical.
    */
  private def bucketed(l: DataFrame, r: DataFrame, leftCols: Seq[String],
                       keys: Seq[String], rightPayload: Seq[String],
                       prefix: String, bucketSeconds: Long): DataFrame = {
    val bucket = floor(unix_timestamp(col("_t")) / bucketSeconds).as("_b")
    val lb = l.withColumn("_b", bucket)
    val rb = r.withColumn("_b", bucket)
    val keyCols = keys.map(col)
    val bucketKey = keyCols :+ col("_b")

    // in-bucket resolution: the merge window, partitioned ALSO by bucket
    // so a hot key's history splits across (time-range / bucketSeconds)
    // tasks instead of one
    val wIn = Window.partitionBy(bucketKey: _*)
      .orderBy(col("_t").asc_nulls_first, col("_side"), xxhash64(col("_rp")))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val inBucket = lb.unionByName(rb, allowMissingColumns = true)
      .withColumn("_in", last(col("_rp"), ignoreNulls = true).over(wIn))
      .where(col("_side") === 1)

    // one row per (key, bucket) that has right rows: that bucket's LAST
    // right payload under the shared total order. Hash aggregate —
    // map-side partial combine absorbs the hot key before the exchange.
    val summary = rb.groupBy(bucketKey: _*)
      .agg(max_by(col("_rp"), struct(col("_t"), xxhash64(col("_rp")))).as("_last_rp"))

    // carry = last right payload of any STRICTLY earlier bucket, for
    // every (key, bucket) either side touches. Null-ts left rows sit in
    // a null bucket that the equi-join below never matches — they fall
    // through to a null payload, same as the merge path.
    val touched = lb.select(bucketKey: _*).unionByName(rb.select(bucketKey: _*)).distinct()
    val wCarry = Window.partitionBy(keyCols: _*).orderBy(col("_b"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = touched
      .join(summary, keys :+ "_b", "left")
      .withColumn("_carry", last(col("_last_rp"), ignoreNulls = true).over(wCarry))
      .select(bucketKey :+ col("_carry"): _*)

    inBucket
      .join(carry, keys :+ "_b", "left")
      .withColumn("_filled", coalesce(col("_in"), col("_carry")))
      .select(leftCols.map(col) ++
        rightPayload.map(c => col(s"_filled.$c").as(prefix + c)): _*)
  }

  /** NATIVE as-of join — same contract as [[asOf]] (single key column),
    * executed by the custom physical operator
    * [[graft.plans.AsOfMergeJoinExec]]: a whole-operator Catalyst
    * extension (`LogicalPlan` node + planner `SparkStrategy` + merge
    * `SparkPlan`) instead of the union+window re-expression. Catalyst
    * still owns the exchanges: the exec DECLARES hash clustering on the
    * key and (key, ts) ordering per child, so EnsureRequirements plans
    * the same one-shuffle-per-side budget as a sort-merge join — and
    * can elide it entirely over bucketed+sorted inputs. The probe is a
    * single O(1)-state pass per partition. AsOfJoinSpec asserts
    * result-parity with [[asOf]] on random histories.
    *
    * The key column must be integral and both ts columns
    * timestamp/long (8-byte comparables — the merge compares raw
    * longs); the right payload arrives `prefix`-renamed, as in [[asOf]].
    */
  def asOfNative(left: DataFrame, right: DataFrame, key: String,
                 leftTs: String, rightTs: String,
                 rightPayload: Seq[String], prefix: String = "asof_"): DataFrame = {
    require(rightPayload.nonEmpty, "rightPayload must name at least one column")
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsOfJoinStrategy
    }
    val l = left.withColumn("_lk", col(key).cast("long"))
    val r = right
      .where(col(rightTs).isNotNull) // null right ts matches nothing
      .select(col(key).cast("long").as("_rk") +:
        col(rightTs).cast("timestamp").as("_rt") +:
        rightPayload.map(c => col(c).as(prefix + c)): _*)
    val lPlan = l.queryExecution.analyzed
    val rPlan = r.queryExecution.analyzed
    def attr(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).getOrElse(sys.error(s"missing column $n"))
    val node = graft.plans.AsOfJoinNode(lPlan, rPlan,
      attr(lPlan, "_lk"), attr(rPlan, "_rk"),
      attr(lPlan, leftTs), attr(rPlan, "_rt"))
    org.apache.spark.sql.graft.GraftBridge.ofRows(spark, node)
      .drop("_lk", "_rk", "_rt")
  }
}
