package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.functions._

import graft.SparkSuite
import graft.queries.CoreQueries

/** Structured Streaming parity: the windowed aggregation over the events
  * table run as a stream (file source, Trigger.AvailableNow) must produce
  * exactly the batch result.
  */
class EventStreamSpec extends SparkSuite {

  test("streamed windowed counts == batch streamWindowCounts at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    // same nanos->micros normalization as graft.sources.Tables.events
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val streamed = EventStream.runAvailableNow(
      EventStream.windowedCounts(events), "wc_test", tmp.resolve("ckpt").toString)
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet

    val batch = CoreQueries.streamWindowCounts(spark, sfDir).collect()
      .map(r => (r.getTimestamp(0).toInstant.toString, r.getString(1), r.getLong(2), r.getDouble(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("stream-stream attribution join == batch streamAttribution at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-attr")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val streamed = EventStream.runAvailableNow(
      EventStream.attributionPairs(events), "attr_test", tmp.resolve("ckpt").toString,
      outputMode = "append")
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

    val batch = CoreQueries.streamAttribution(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("left-outer stream-stream attribution == batch streamAttributionOuter after sentinel flush") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-attr-outer")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val rawBatch = spark.read.parquet(inDir.toString)
    val tsIsLong = rawBatch.schema("ts").dataType.typeName == "long"
    // watermark-flushing sentinel: one 'noop' event 10 days past max ts.
    // Outer rows only emit when the watermark proves no match can still
    // arrive; without the sentinel every unmatched purchase in the last
    // lateness+window of the data would stay in state and the parity
    // check would be tail-truncated.
    def sentinelTs(days: Int) = rawBatch.agg(max(col("ts"))).head.get(0) match {
      case l: Long => lit(l + days * 86400L * 1000000000L)
      case ldt: java.time.LocalDateTime => lit(ldt.plusDays(days))
      case t: java.sql.Timestamp => lit(new java.sql.Timestamp(t.getTime + days * 86400L * 1000L))
      case other => fail(s"unexpected ts type: $other")
    }
    // The watermark nodes sit AFTER the event_type filters, so a
    // sentinel only advances the watermark if it IS a click and a
    // purchase (multipleWatermarkPolicy=min needs BOTH branches to
    // move). The sentinel user is -1 and excluded from the comparison.
    def writeSentinel(days: Int): Unit =
      Seq("click", "purchase").foreach { t =>
        rawBatch.limit(1)
          .withColumn("event_id", lit(99999900L + days + (if (t == "click") 0 else 1)))
          .withColumn("ts", sentinelTs(days))
          .withColumn("user_id", lit(-1L))
          .withColumn("event_type", lit(t))
          .coalesce(1).write.mode("append").parquet(inDir.toString)
      }
    def streamEvents() = {
      val raw = spark.readStream.schema(spark.read.parquet(inDir.toString).schema)
        .parquet(inDir.toString)
      if (tsIsLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw.withColumn("ts", col("ts").cast("timestamp"))
    }
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))
    // Outer-join state evicts against the watermark committed by the
    // PREVIOUS batch, and AvailableNow stops once all files are
    // processed — so one run leaves the final lateness-window's
    // unmatched purchases in state. Standard flush recipe: a second
    // run on the SAME checkpoint whose only new data is a later
    // sentinel; its batch executes with the first sentinel's watermark
    // already committed and emits the held null rows. The sink must be
    // restart-capable (memory sink is not): a parquet file sink
    // accumulates both runs' appends.
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString
    def runOnce(): Unit = {
      val q = EventStream.attributionPairsOuter(streamEvents()).writeStream
        .format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    writeSentinel(10)
    runOnce()
    writeSentinel(20)
    runOnce()
    val streamed = spark.read.parquet(outDir).collect().map(key).toSet
      .filter(_._3 != -1L) // drop the sentinel user's own rows
    val batch = CoreQueries.streamAttributionOuter(spark, sfDir).collect()
      .map(key).toSet
    assert(streamed == batch)
    assert(batch.exists(_._2 == -1L), "expected at least one unattributed purchase")
  }

  test("streamed session_window sessions == batch Sessionize at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-sess")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw

    val streamed = EventStream.runAvailableNow(
      EventStream.sessionCounts(events), "sess_test", tmp.resolve("ckpt").toString)
      .map(r => (r.getLong(0), r.getTimestamp(1).toInstant.toString,
        r.getTimestamp(2).toInstant.toString, r.getLong(3)))
      .toSet

    // batch gap sessions, aggregated to the same (user, start, end, n) shape.
    // The sf0.001 data has no gap of exactly 30 minutes (verified), so the
    // half-open session_window boundary cannot diverge from the batch rule.
    val batch = graft.operators.Sessionize
      .assign(graft.sources.Tables.events(spark, sfDir), Seq("user_id"), "ts",
        gapSeconds = 1800, tieCols = Seq("event_id"))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(min(col("ts")).as("s"), max(col("ts")).as("e"), count(lit(1)).as("n"))
      .collect()
      .map(r => (r.getLong(0), r.getTimestamp(2).toInstant.toString,
        r.getTimestamp(3).toInstant.toString, r.getLong(4)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("flatMapGroupsWithState status intervals == batch lag window at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-state")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val streamed = EventStream.runAvailableNow(
      EventStream.statusIntervals(events).toDF(), "si_test",
      tmp.resolve("ckpt").toString, outputMode = "append")
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toInstant.toString, r.getLong(3)))
      .toSet

    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val batch = graft.sources.Tables.events(spark, sfDir)
      .select(col("user_id"), col("ts"), col("event_id"),
        lag(col("event_type"), 1).over(w).as("from_status"),
        lag(col("ts"), 1).over(w).as("prev_ts"))
      .where(col("from_status").isNotNull)
      .select(col("user_id"), col("from_status"), col("ts"),
        ((col("ts").cast("long") - col("prev_ts").cast("long"))).as("duration_s"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2).toInstant.toString, r.getLong(3)))
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming funnelProgress final rows == batch Funnel.steps at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-funnel")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    val stages = Seq("view", "click", "purchase")
    // one AvailableNow batch delivers in event-time order after the
    // per-group sort, so greedy matching == the batch per-stage min;
    // the LAST row per user is the final funnel state
    val streamed = EventStream.runAvailableNow(
      EventStream.funnelProgress(events, stages, 86400L).toDF(), "funnel_test",
      tmp.resolve("ckpt").toString, outputMode = "append")
      .map(r => (r.getLong(0), r.getInt(1), r.getTimestamp(2).toInstant.toString,
        r.getTimestamp(3).toInstant.toString))
      .groupBy(_._1).map { case (_, rows) => rows.maxBy(_._2) }
      .toSet

    val batch = graft.operators.Funnel.steps(
      graft.sources.Tables.events(spark, sfDir), "user_id", "ts",
      stages.map(t => col("event_type") === t), 86400L)
      .where(col("funnel_level") >= 1)
      .collect()
      .map { r =>
        val lvl = r.getAs[Int]("funnel_level")
        (r.getAs[Long]("user_id"), lvl,
          r.getAs[java.sql.Timestamp]("t1").toInstant.toString,
          r.getAs[java.sql.Timestamp](s"t$lvl").toInstant.toString)
      }
      .toSet
    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("statusIntervals drops cross-batch late events instead of emitting negative durations") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-stream-late")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    val ckpt = tmp.resolve("ckpt").toString
    def ts(hh: Int) = java.sql.Timestamp.valueOf(f"2024-01-09 $hh%02d:00:00")
    def write(name: String, rows: Seq[(Long, Long, String, java.sql.Timestamp)]): Unit =
      rows.toDF("user_id", "event_id", "event_type", "ts")
        .coalesce(1).write.parquet(inDir.resolve(name).toString)
    write("b1", Seq((1L, 1L, "open", ts(10)), (1L, 2L, "review", ts(12))))

    val outDir = tmp.resolve("out").toString
    val schema = spark.read.parquet(inDir.toString + "/*").schema
    def run(): Set[(Long, String, Long)] = {
      // memory sink cannot recover a checkpoint; a parquet sink can, so
      // the second run resumes the SAME stateful query
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString + "/*")
      val q = EventStream.statusIntervals(stream).toDF().writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("from_status"), r.getAs[Long]("duration_s"))).toSet
    }
    assert(run() == Set((1L, "open", 7200L)))
    // a second batch delivers an event OLDER than the committed state
    // (ts 11:00 < 12:00) plus a genuinely new one
    write("b2", Seq((1L, 3L, "stale", ts(11)), (1L, 4L, "closed", ts(15))))
    val second = run() // cumulative parquet output of both runs
    // the stale 11:00 event is dropped (no 'review'→'stale' or negative
    // row); only the genuinely new 12:00→15:00 interval is appended
    assert(second == Set((1L, "open", 7200L), (1L, "review", 10800L)))
    assert(second.forall(_._3 >= 0))
  }

  test("firstSeenBootstrapped seeds streaming dedup state from the batch fingerprint store") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-fsb")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString
    val storeDir = tmp.resolve("store").toString

    // batch era: incrementalDedupRun ingested these two documents
    graft.operators.Dedup.incrementalDedupRun(
      Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")).toDF("doc_id", "text"),
      storeDir, "text", "doc_id")(_ => ())

    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = tmp.resolve(name + "_stage")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, inDir.resolve(name + ".parquet"))
    }
    // doc 10 re-delivers batch-era content (normalization variant), doc
    // 11 is new, docs 12/13 are an in-stream duplicate pair
    write("b1", Seq(
      (10L, "  ALPHA   beta GAMMA "), (11L, "zeta eta"),
      (12L, "theta iota"), (13L, "theta  IOTA")))

    val schema = spark.read.parquet(inDir.toString).schema
    def run(): Set[Long] = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      val q = EventStream.firstSeenBootstrapped(stream, "text", storeDir).writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    }
    val first = run()
    // 10 dropped by BOOTSTRAPPED state; one of the 12/13 pair survives
    assert(!first.contains(10L) && first.contains(11L))
    assert(first.count(Set(12L, 13L)) == 1, s"expected one of the in-stream pair, got $first")
    // a later batch: another batch-era re-delivery + a dup of the
    // streaming era + a genuinely new doc — only the new doc lands,
    // proving checkpointed state carries both eras across a restart
    write("b2", Seq((20L, "delta   EPSILON"), (21L, "zeta eta"), (22L, "kappa lambda")))
    val second = run()
    assert(second == first + 22L)
  }

  test("streaming firstSeen dedup holds fingerprint state across micro-batches and restarts") {
    import spark.implicits._
    val tmp = Files.createTempDirectory("graft-fs")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    val ckpt = tmp.resolve("ckpt").toString
    val outDir = tmp.resolve("out").toString

    def write(name: String, rows: Seq[(Long, String)]): Unit = {
      val stage = tmp.resolve(name + "_stage")
      rows.toDF("doc_id", "text").coalesce(1).write.parquet(stage.toString)
      val part = Files.list(stage).filter(_.toString.endsWith(".parquet")).findFirst().get()
      Files.move(part, inDir.resolve(name + ".parquet"))
    }
    write("b1", Seq((1L, "alpha beta gamma"), (2L, "delta epsilon")))

    val schema = spark.read.parquet(inDir.toString).schema
    def run(): Set[Long] = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(inDir.toString)
      val q = EventStream.firstSeen(stream, "text").writeStream
        .format("parquet").option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
    }
    assert(run() == Set(1L, 2L))
    // doc 3 duplicates doc 1's content (differing only in whitespace —
    // the fingerprint normalizes it); doc 4 is new. The duplicate must be
    // dropped by state RECOVERED from the checkpoint in a fresh run.
    write("b2", Seq((3L, "  ALPHA   beta GAMMA "), (4L, "zeta eta")))
    assert(run() == Set(1L, 2L, 4L))
  }

  test("streamed minute counts -> detectFromCounts == batch RateAnomaly.detect at sf0.001") {
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-anom")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    val raw = spark.readStream.schema(schema).parquet(inDir.toString)
    val events =
      if (schema("ts").dataType.typeName == "long")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw

    val streamedCounts = EventStream.runAvailableNow(
      EventStream.minuteCounts(events), "anom_test", tmp.resolve("ckpt").toString)
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    import spark.implicits._
    val countsDf = streamedCounts.toSeq.toDF("event_type", "bucket", "n_events")
    val streamed = graft.operators.RateAnomaly.detectFromCounts(countsDf, "event_type")
      .select("event_type", "bucket", "n_events", "z", "is_anomaly")
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSet

    val batchEvents = graft.sources.Tables.events(spark, sfDir)
    val batch = graft.operators.RateAnomaly.detect(batchEvents, "event_type", "ts")
      .select("event_type", "bucket", "n_events", "z", "is_anomaly")
      .as[(String, Long, Long, Option[Double], Boolean)].collect().toSet

    assert(streamed == batch)
    assert(streamed.nonEmpty)
  }

  test("streaming Misra-Gries heavy hitters == the ordered batch fold per shard") {
    import spark.implicits._
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-mg")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    def cols(df: org.apache.spark.sql.DataFrame) = df.select(
      pmod(conv(substring(md5(get_json_object(col("props"), "$.k")), 1, 6), 16, 10)
        .cast("long"), lit(4L)).as("shard"),
      get_json_object(col("props"), "$.k").as("term"),
      col("event_id").as("ord"))

    val stream = cols(spark.readStream.schema(schema).parquet(inDir.toString))
    val streamed = EventStream.heavyHitters(stream, "shard", "term", "ord", capacity = 8)
      .toDF("shard", "counters")
      .select(col("shard"), col("counters").cast("string"))
      .as[(Long, String)]
    val got = EventStream.runAvailableNow(streamed.toDF("shard", "counters"),
      "mg_test", tmp.resolve("ckpt").toString, outputMode = "update")
      .map(r => (r.getLong(0), r.getString(1))).toMap

    // plain Scala replay of the same ordered fold per shard
    val rows = cols(spark.read.parquet(inDir.toString))
      .as[(Long, String, Long)].collect()
    val expected = rows.groupBy(_._1).map { case (shard, rs) =>
      val counters = scala.collection.mutable.HashMap.empty[String, Long]
      rs.sortBy(r => (r._3, r._2)).foreach { case (_, t, _) =>
        counters.get(t) match {
          case Some(c) => counters(t) = c + 1
          case None if counters.size < 8 => counters(t) = 1L
          case None =>
            val dead = counters.iterator.collect { case (k, 1L) => k }.toList
            counters.mapValuesInPlace((_, c) => c - 1)
            dead.foreach(counters.remove)
        }
      }
      shard -> counters.toSeq.sortBy { case (t, c) => (-c, t) }
        .map { case (t, c) => s"{$t, $c}" }.mkString("[", ", ", "]")
    }
    assert(got == expected)
    assert(got.size == 4)
    // MG guarantee: every counter set stays within capacity
    assert(expected.values.forall(_.count(_ == '{') <= 8))
  }

  test("streaming KMV distinct state == batch kmv_min_k over the same prefix") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-kmv")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    val coin = conv(substring(md5(col("user_id").cast("string")), 1, 6), 16, 10).cast("long")

    val stream = spark.readStream.schema(schema).parquet(inDir.toString)
      .select(col("event_type"), coin.as("coin"))
    val streamed = EventStream.runAvailableNow(
      EventStream.kmvDistinct(stream, "event_type", "coin", k = 32).toDF("key", "mink"),
      "kmv_test", tmp.resolve("ckpt").toString, outputMode = "update")
      .map(r => (r.getString(0), r.getSeq[Long](1))).toMap

    val batch = spark.read.parquet(inDir.toString)
      .select(col("event_type"), coin.as("coin"))
      .groupBy(col("event_type"))
      .agg(call_function("kmv_min_k", col("coin"), lit(32)).as("mink"))
      .as[(String, Seq[Long])].collect().toMap

    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.values.forall(_.size <= 32))
  }

  test("streaming HLL registers == batch hll_registers over the same prefix") {
    import spark.implicits._
    graft.plans.GraftExtensions.register(spark)
    val sfDir = "/root/testdata/sf0.001"
    val tmp = Files.createTempDirectory("graft-stream-hll")
    val inDir = tmp.resolve("in"); Files.createDirectories(inDir)
    Files.copy(Paths.get(s"$sfDir/events.parquet"), inDir.resolve("events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    val schema = spark.read.parquet(inDir.toString).schema
    // the engine's portable 56-bit coin
    val coin = conv(substring(md5(col("user_id").cast("string")), 1, 14), 16, 10).cast("long")

    val stream = spark.readStream.schema(schema).parquet(inDir.toString)
      .select(col("event_type"), coin.as("coin"))
    val streamed = EventStream.runAvailableNow(
      EventStream.hllDistinct(stream, "event_type", "coin", p = 8).toDF("key", "regs"),
      "hll_test", tmp.resolve("ckpt").toString, outputMode = "update")
      .map(r => (r.getString(0), r.getSeq[Int](1))).toMap

    val batch = spark.read.parquet(inDir.toString)
      .select(col("event_type"), coin.as("coin"))
      .groupBy(col("event_type"))
      .agg(call_function("hll_registers", col("coin"), lit(8)).as("regs"))
      .as[(String, Seq[Int])].collect().toMap

    assert(streamed == batch)
    assert(streamed.nonEmpty && streamed.values.forall(_.size == 256))
  }
}
