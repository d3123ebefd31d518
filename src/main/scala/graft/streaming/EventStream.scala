package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.Row

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

  /** Run a stream to completion over the currently-available input
    * (Trigger.AvailableNow) into an in-memory table; returns the result.
    * NOTE: complete output mode (required by the memory sink for a full
    * table readback) retains all window state — a resident deployment
    * (`Trigger.ProcessingTime("30 minutes")`) must use update/append mode
    * against a real sink so the watermark actually evicts state.
    */
  def runAvailableNow(out: DataFrame, queryName: String, checkpoint: String): Array[Row] = {
    val writer: DataStreamWriter[Row] = out.writeStream
      .format("memory")
      .queryName(queryName)
      .outputMode("complete")
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
    val q = writer.start()
    q.awaitTermination()
    out.sparkSession.table(queryName).collect()
  }
}
