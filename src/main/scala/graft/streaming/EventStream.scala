package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, GroupState, GroupStateTimeout, OutputMode, Trigger}

/** Structured Streaming surface (SURVEY.md §2.9).
  *
  * The reference's "stream" is a 30-minute scheduled micro-batch
  * (main.py:139-146); the Spark-native equivalents:
  *   - Str1 trigger: `Trigger.AvailableNow` (catch-up batch, exits) or
  *     `Trigger.ProcessingTime` (resident micro-batch loop);
  *   - Str2 incremental scan: the file source only picks up NEW files per
  *     batch, checkpointed — the watermark filter becomes source state;
  *   - Str3 late data: event-time watermark bounds the windowed state;
  *     late-beyond-watermark rows are dropped (the batch path instead
  *     dedups on write, A4).
  */
object EventStream {

  /** Tumbling-window counts over an event stream — the streaming form of
    * CoreQueries.streamWindowCounts (same plan + a watermark).
    */
  def windowedCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"), col("total_value"))

  /** Per-(event_type, minute-bucket) counts as a stream — the
    * incremental half of the rate-anomaly monitor: the stream maintains
    * the bucket table, and each trigger runs
    * [[graft.operators.RateAnomaly.detectFromCounts]] over it as a
    * (tiny, #keys × #buckets) batch query. Bucket ids match the batch
    * operator's `unix_micros div 60e6` exactly, so parity is row-level
    * (suite-pinned in EventStreamSpec).
    */
  def minuteCounts(events: DataFrame, lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), "1 minute"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("event_type"),
        expr("unix_micros(window.start) div 60000000L").as("bucket"), col("n_events"))

  /** Watermarked STREAM-STREAM attribution join — the click→purchase
    * credit assignment every event pipeline runs, and the one
    * Structured Streaming join shape nothing else in this file
    * exercises: two branches of the event stream (clicks, purchases)
    * joined on user with a time-range predicate (`click_ts` within
    * `attWindow` BEFORE the purchase). Emits one row per attributed
    * (purchase, click) pair with the gap in exact microseconds.
    *
    * Why the constraints matter at scale: a stream-stream inner join
    * must buffer BOTH sides in state until no future match is possible;
    * the watermark on each side plus the time-range condition bound
    * that state to `lateness + attWindow` of events per side — without
    * the range predicate the click buffer would be unbounded (any
    * future purchase could match any past click). State is keyed by
    * `user_id`, so the join shuffles both branches on the user key once
    * and matches within partitions — the same exchange the batch twin
    * ([[graft.queries.CoreQueries.streamAttribution]]) pays, whose
    * result after AvailableNow drains the stream is row-identical
    * (suite-pinned).
    */
  def attributionPairs(events: DataFrame, attWindow: String = "30 minutes",
                       lateness: String = "1 hour"): DataFrame = {
    val ev = events.withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attWindow"))
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** LEFT OUTER twin of [[attributionPairs]] — every purchase emits,
    * unattributed ones with a null click. The streaming-specific
    * semantics the inner join hides: a matched pair still streams out
    * immediately, but an UNMATCHED purchase must be held in state until
    * the watermark proves no qualifying click can still arrive (its
    * range bound + lateness), and only then emits null-padded — i.e.
    * outer results are delayed by exactly the lateness bound, the
    * price of a correct "conversion WITHOUT prior click" stream. Same
    * one user-key exchange per side, state bounded by window+lateness;
    * batch-parity (after a watermark-flushing sentinel) is pinned in
    * EventStreamSpec against
    * [[graft.queries.CoreQueries.streamAttributionOuter]].
    */
  def attributionPairsOuter(events: DataFrame, attWindow: String = "30 minutes",
                            lateness: String = "1 hour"): DataFrame = {
    val ev = events.withColumn("ts", col("ts").cast("timestamp"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
      .withWatermark("click_ts", lateness)
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))
      .withWatermark("purchase_ts", lateness)
    purchases.join(clicks,
      col("c_user") === col("user_id") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"INTERVAL $attWindow"),
      "leftOuter")
      .select(col("purchase_id"), col("click_id"), col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Streaming KMV distinct-count sketch — the batch aggregate
    * ([[graft.plans.KmvMinK]]) carried as mapGroupsWithState state: per
    * key, the k smallest distinct coins ever seen (an `Array[Long]`,
    * the same mergeable summary), each trigger emitting the key's
    * current retained set. Because min-k of a set is
    * order-independent, the streaming result after any prefix of the
    * stream equals the batch aggregate over that prefix — the parity
    * EventStreamSpec pins against `kmv_min_k`. This is the "how many
    * distinct users/urls/fingerprints so far" monitor at a state cost
    * of k longs per key, where exact streaming distinct state grows
    * with the true cardinality.
    */
  def kmvDistinct(rows: DataFrame, keyCol: String, coinCol: String,
                  k: Int): Dataset[(String, Seq[Long])] = {
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(keyCol).cast("string"), col(coinCol).cast("long")).as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Long], (String, Seq[Long])](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          val set = new java.util.TreeSet[java.lang.Long]()
          state.getOption.foreach(_.foreach(v => set.add(v)))
          it.foreach { case (_, c) =>
            if (set.size >= k) {
              if (c < set.last()) { set.add(c); if (set.size > k) set.pollLast() }
            } else set.add(c)
          }
          val arr = new Array[Long](set.size)
          val iter = set.iterator(); var i = 0
          while (iter.hasNext) { arr(i) = iter.next(); i += 1 }
          state.update(arr)
          (key, arr.toSeq)
      }
  }

  /** Streaming HyperLogLog: the register sketch
    * ([[graft.plans.HllRegisters]]) carried as `mapGroupsWithState`
    * state — per key one 2^p-byte register array, updated by
    * elementwise max as micro-batches arrive. Because HLL registers are
    * a mergeable summary (max is idempotent, commutative, associative),
    * the streaming state after any prefix EQUALS the batch aggregate
    * over that prefix (suite-pinned parity against `hll_registers`),
    * and state size is constant per key no matter how many events
    * stream through — the property that makes per-key distinct counting
    * viable in an unbounded stream where exact distinct state grows
    * without limit.
    */
  def hllDistinct(rows: DataFrame, keyCol: String, coinCol: String,
                  p: Int): Dataset[(String, Seq[Int])] = {
    val spark = rows.sparkSession
    import spark.implicits._
    val m = 1 << p
    val wBits = 56 - p
    val wMask = (1L << wBits) - 1
    rows.select(col(keyCol).cast("string"), col(coinCol).cast("long")).as[(String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Array[Byte], (String, Seq[Int])](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (key, it, state) =>
          val regs = state.getOption.getOrElse(new Array[Byte](m))
          it.foreach { case (_, coin) =>
            val j = (coin >>> wBits).toInt & (m - 1)
            val w = coin & wMask
            val rho = (wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
            if (rho > regs(j)) regs(j) = rho
          }
          state.update(regs)
          (key, regs.map(_.toInt).toSeq)
      }
  }

  /** One status-interval row: user was in `from_status` for `duration_s`
    * seconds, ending at `ts` (the streaming analog of the W2 lag window /
    * A1 transition rows).
    */
  final case class StatusInterval(user_id: Long, from_status: String, ts: Timestamp, duration_s: Long)

  /** lastTsUs is MICROsecond precision: the late-event comparison must
    * see the same resolution the in-batch sort uses, or a sub-millisecond
    * -late event would slip past a millisecond-truncated state.
    */
  final case class UserState(lastType: String, lastTsUs: Long)

  private def micros(ts: Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private[streaming] final case class EventRow(user_id: Long, event_id: Long, event_type: String, ts: Timestamp)

  /** Str: custom keyed state via `flatMapGroupsWithState` — per-user
    * last-(status, time) state emitting a duration row on every
    * transition, exactly the reference's per-issue accumulator
    * (models/issue.py:196-224) re-expressed as streaming state. Batch
    * equivalence: the same rows as a `lag` window over a static frame
    * (asserted in EventStreamSpec) WHEN the source delivers micro-batches
    * in event-time order (e.g. chronological files). Events are ordered
    * within each batch; an event older than the committed state timestamp
    * (late across batches) is DROPPED like a watermark would drop it —
    * the batch path sorts globally instead, so late cross-batch data is
    * where the two forms legitimately diverge. Null-timestamp rows are
    * filtered (the batch lag form emits null durations for them).
    * `NoTimeout` keeps state resident — a timeout-capable mode schedules
    * extra trigger cycles to fire timers, which keeps a
    * `Trigger.AvailableNow` run from ever terminating; a resident
    * production deployment switches to `ProcessingTimeTimeout` +
    * `state.setTimeoutDuration` to evict idle users.
    *
    * Scale note: state is partitioned by user key in the state store —
    * per-key memory is O(1) (one status + one timestamp), so state size
    * is bounded by live-key cardinality, not event volume.
    */
  def statusIntervals(events: DataFrame): Dataset[StatusInterval] = {
    val spark = events.sparkSession
    import spark.implicits._
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type").cast("string"), col("ts").cast("timestamp"))
      .where(col("ts").isNotNull && col("user_id").isNotNull && col("event_id").isNotNull)
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, StatusInterval](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[UserState]) =>
          // order this batch's slice by full-precision (ts, event_id),
          // like the batch window (getTime millis alone would reorder
          // same-millisecond events with sub-ms timestamps)
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          val out = Seq.newBuilder[StatusInterval]
          var st = state.getOption.orNull
          for (e <- sorted) {
            val us = micros(e.ts)
            if (st == null || us >= st.lastTsUs) {
              if (st != null) {
                // floor-to-second BEFORE subtracting, matching the batch
                // form's `cast(ts as long)` epoch-second truncation
                val sec = Math.floorDiv(us, 1000000L) - Math.floorDiv(st.lastTsUs, 1000000L)
                out += StatusInterval(userId, st.lastType, e.ts, sec)
              }
              st = UserState(e.event_type, us)
            } // else: late beyond committed state -> dropped (see scaladoc)
          }
          if (st != null) state.update(st)
          out.result().iterator
      }
  }

  /** Per-user funnel progress: deepest stage reached so far, the chain's
    * anchor timestamp and the deepest stage's matched timestamp.
    */
  final case class FunnelProgress(user_id: Long, funnel_level: Int,
                                  t1: Timestamp, t_level: Timestamp)

  /** matched(i) = micros of the stage-(i+1) match, ascending. */
  final case class FunnelState(matched: Seq[Long])

  /** Streaming first-touch funnel — the resident form of
    * [[graft.operators.Funnel.steps]]: per-user state holds the matched
    * stage timestamps; a stage-(k+1) event extends the chain when it is
    * at/after the stage-k match and within `windowSeconds` of the
    * anchor, and a row is emitted whenever a user's level ADVANCES (a
    * funnel dashboard updating per micro-batch).
    *
    * Batch equivalence (asserted in EventStreamSpec): greedy in-arrival
    * matching equals the batch form's per-stage `min` WHEN micro-batches
    * deliver in event-time order — the statusIntervals contract. Out of
    * order, the anchor is STICKY: a later-arriving earlier stage-1 event
    * does not retroactively re-anchor the chain (the batch form,
    * re-run over the full log, would) — same divergence class as the
    * watermark dropping late rows.
    *
    * Scale note: state is O(stages) per live user — bounded by key
    * cardinality; an idle-user eviction policy is the same
    * ProcessingTimeTimeout switch documented on [[statusIntervals]].
    */
  def funnelProgress(events: DataFrame, stageTypes: Seq[String],
                     windowSeconds: Long): Dataset[FunnelProgress] = {
    require(stageTypes.size >= 2, "need at least 2 funnel stages")
    val spark = events.sparkSession
    import spark.implicits._
    val n = stageTypes.size
    events
      .select(col("user_id").cast("long"), col("event_id").cast("long"),
        col("event_type").cast("string"), col("ts").cast("timestamp"))
      .where(col("ts").isNotNull && col("user_id").isNotNull)
      .as[EventRow]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelProgress](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[FunnelState]) =>
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.ts.getNanos, e.event_id))
          var m = state.getOption.map(_.matched).getOrElse(Seq.empty)
          val before = m.size
          for (e <- sorted) {
            val lvl = m.size
            if (lvl < n && e.event_type == stageTypes(lvl)) {
              val us = micros(e.ts)
              val eligible =
                if (lvl == 0) true
                else us >= m.last && us <= m.head + windowSeconds * 1000000L
              if (eligible) m = m :+ us
            }
          }
          if (m.size > before) {
            state.update(FunnelState(m))
            val toTs = (us: Long) => {
              val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
              t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
              t
            }
            Iterator.single(FunnelProgress(userId, m.size, toTs(m.head), toTs(m.last)))
          } else Iterator.empty
      }
  }

  /** Streaming gap sessions via Spark's NATIVE `session_window` — the
    * streaming twin of [[graft.operators.Sessionize]]: per (user,
    * session-of-inactivity-gap) counts and span, session state merged
    * incrementally across micro-batches and evicted once the watermark
    * passes a session's close. Boundary semantics: `session_window`
    * windows are half-open `[start, last + gap)`, so an event at EXACTLY
    * `gap` after the previous one starts a NEW session, where the batch
    * operator's strictly-greater rule keeps it (parity everywhere except
    * that measure-zero boundary — asserted on real data in
    * EventStreamSpec).
    */
  def sessionCounts(events: DataFrame, gap: String = "30 minutes",
                    lateness: String = "1 hour"): DataFrame =
    events
      .withColumn("ts", col("ts").cast("timestamp"))
      .withWatermark("ts", lateness)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"), max(col("ts")).as("session_end"))
      .select(col("user_id"), col("session_start"), col("session_end"), col("n_events"))

  /** Streaming exact dedup — the streaming form of
    * [[graft.operators.Dedup.exactGroups]], and the ingestion-side answer
    * to "never train on the same document twice" when the corpus arrives
    * continuously: keep the FIRST document seen per content fingerprint
    * across micro-batches. Spark's stateful streaming `dropDuplicates`
    * holds one state-store entry per distinct fingerprint, partitioned by
    * key — memory is bounded by distinct-content cardinality, not stream
    * volume, and survives restarts via the checkpoint.
    *
    * State never expires here (a duplicate must be caught however far
    * apart the copies arrive). When the stream carries an event-time
    * column and re-delivery has a bounded horizon, use
    * [[firstSeenWithinWatermark]] to evict state past the watermark.
    */
  def firstSeen(docs: DataFrame, textCol: String): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.Dedup.exactFingerprint(col(textCol)))
      .dropDuplicates("fingerprint")

  /** [[firstSeen]] BOOTSTRAPPED from the batch fingerprint store
    * ([[graft.state.FingerprintStore]]) — the batch→streaming handoff of
    * the cross-run dedup story: a corpus built by batch runs of
    * [[graft.operators.Dedup.incrementalDedupRun]] switches to streaming
    * ingestion WITHOUT re-training on anything the batch era already
    * ingested. The store's fingerprints arrive as the INITIAL state of a
    * `flatMapGroupsWithState` keyed by fingerprint (seeding Spark's
    * state store, so the stream never re-reads the batch store after
    * startup); per key the first unseen document is emitted and the key
    * is marked, exactly [[firstSeen]]'s semantics afterwards.
    *
    * Initial state applies on the FIRST start only — on restart the
    * checkpoint's state (a superset) wins, per Spark's initial-state
    * contract. "First" among same-fingerprint rows inside one
    * micro-batch follows partition order, the same arbitrary-winner
    * contract as `dropDuplicates`. State size = distinct fingerprints,
    * identical to [[firstSeen]]; the bootstrap adds no steady-state
    * cost.
    */
  def firstSeenBootstrapped(docs: DataFrame, textCol: String, storeDir: String): DataFrame = {
    val spark = docs.sparkSession
    val fp = docs.withColumn("fingerprint", graft.operators.Dedup.exactFingerprint(col(textCol)))
    implicit val rowEnc: Encoder[Row] = Encoders.row(fp.schema)
    implicit val strEnc: Encoder[String] = Encoders.STRING
    implicit val boolEnc: Encoder[Boolean] = Encoders.scalaBoolean
    val init = graft.state.FingerprintStore.load(spark, storeDir)
      .groupByKey(_.getString(0))
      .mapValues(_ => true)
    fp.groupByKey(r => r.getString(r.fieldIndex("fingerprint")))
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.NoTimeout, initialState = init) {
        (_: String, rows: Iterator[Row], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            rows.take(1)
          }
      }
      .toDF(fp.columns: _*)
  }

  /** [[firstSeen]] with watermark-bounded state: duplicates are only
    * caught within `lateness` of the event-time high-water mark, and
    * fingerprint state older than that is evicted — the deliberate
    * state-size/recall trade for unbounded streams with bounded
    * re-delivery (`dropDuplicatesWithinWatermark` semantics).
    */
  def firstSeenWithinWatermark(docs: DataFrame, textCol: String, tsCol: String,
                               lateness: String): DataFrame =
    docs
      .withColumn("fingerprint", graft.operators.Dedup.exactFingerprint(col(textCol)))
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark("fingerprint")

  /** Run a stream to completion over the currently-available input
    * (Trigger.AvailableNow) into an in-memory table; returns the result.
    * NOTE: complete output mode (required by the memory sink for a full
    * table readback) retains all window state — a resident deployment
    * (`Trigger.ProcessingTime("30 minutes")`) must use update/append mode
    * against a real sink so the watermark actually evicts state.
    */
  /** Streaming Misra–Gries heavy hitters: per shard, at most `capacity`
    * (term, counter) pairs carried as `mapGroupsWithState` state — the
    * bounded-memory "which items are heavy so far" monitor
    * ([[graft.operators.TextAnalysis.topTermsSketch]]'s sketch as
    * streaming state; identical decrement-all charge semantics). Every
    * true item with frequency > n_shard/(capacity+1) is guaranteed
    * present, and a retained counter under-counts by at most
    * n_shard/(capacity+1) — the classic MG bound, per shard; sharding
    * by a hash of the term keeps the guarantee (each term lives in
    * exactly one shard) while distributing state.
    *
    * MG is ORDER-dependent, so each micro-batch's group is folded in
    * (`orderCol`, term) order — under `Trigger.AvailableNow` on a
    * static prefix the result is deterministic and equals the same
    * fold run in batch (EventStreamSpec pins parity against a plain
    * Scala replay). Emits one row per shard: the retained counters
    * sorted heaviest-first (count desc, term asc).
    */
  def heavyHitters(rows: DataFrame, shardCol: String, termCol: String,
                   orderCol: String, capacity: Int): Dataset[(Long, Seq[(String, Long)])] = {
    require(capacity > 0, "capacity must be positive")
    val spark = rows.sparkSession
    import spark.implicits._
    rows.select(col(shardCol).cast("long"), col(termCol).cast("string"),
        col(orderCol).cast("long"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[(String, Long)], (Long, Seq[(String, Long)])](
        org.apache.spark.sql.streaming.GroupStateTimeout.NoTimeout) {
        case (shard, it, state) =>
          val counters = scala.collection.mutable.HashMap.empty[String, Long]
          state.getOption.foreach(_.foreach { case (t, c) => counters(t) = c })
          it.toSeq.sortBy { case (_, t, o) => (o, t) }.foreach { case (_, t, _) =>
            counters.get(t) match {
              case Some(c) => counters(t) = c + 1
              case None if counters.size < capacity => counters(t) = 1L
              case None =>
                val dead = counters.iterator.collect { case (k, 1L) => k }.toList
                counters.mapValuesInPlace((_, c) => c - 1)
                dead.foreach(counters.remove)
            }
          }
          val kept = counters.toSeq.sortBy { case (t, c) => (-c, t) }
          state.update(kept)
          (shard, kept)
      }
  }

  def runAvailableNow(out: DataFrame, queryName: String, checkpoint: String,
                      outputMode: String = "complete"): Array[Row] = {
    val writer: DataStreamWriter[Row] = out.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode(outputMode)
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    val q = writer.start()
    q.awaitTermination()
    out.sparkSession.table(queryName).collect()
  }
}
