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
}
