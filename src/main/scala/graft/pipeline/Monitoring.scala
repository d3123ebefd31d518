package graft.pipeline

import java.net.{DatagramPacket, DatagramSocket, InetAddress}
import java.nio.charset.StandardCharsets.UTF_8

/** DogStatsD-flavor UDP metrics emitter ≙ the reference's
  * `DogStatsdClient` (services/monitoring.py:20-77): fire-and-forget
  * `prefix_name:value|type|#tag:v,...` datagrams, metric names joined
  * with `_` under a prefix, constant base tags, and a hard no-op when
  * disabled (monitoring.py:50-56).
  *
  * Spark-first placement: emission happens on the DRIVER from
  * [[IssuePipeline.RunStats]] / aggregate totals — emitting from inside
  * stages would multiply-count every gauge by the task count (and
  * re-send on task retry). UDP is intentionally unacknowledged: metrics
  * must never fail or slow the pipeline.
  */
final class StatsdEmitter(host: String, port: Int,
                          prefix: String = "tracker_exporter",
                          baseTags: Seq[(String, String)] = Nil,
                          enabled: Boolean = true) extends AutoCloseable {

  private lazy val socket = new DatagramSocket()
  private lazy val addr = InetAddress.getByName(host)

  private def num(value: Double): String =
    if (value == value.toLong.toDouble) value.toLong.toString else value.toString

  private def tagSuffix(tags: Seq[(String, String)]): String = {
    val all = baseTags ++ tags
    if (all.isEmpty) "" else all.map { case (k, v) => s"$k:$v" }.mkString("|#", ",", "")
  }

  private def send(line: String): Unit = if (enabled) {
    val b = line.getBytes(UTF_8)
    socket.send(new DatagramPacket(b, b.length, addr, port))
  }

  /** Gauge ≙ send_gauge_metric (monitoring.py:61-66). */
  def gauge(name: String, value: Double, tags: Seq[(String, String)] = Nil): Unit =
    send(s"${prefix}_$name:${num(value)}|g${tagSuffix(tags)}")

  /** Counter increment ≙ send_count_metric (monitoring.py:44-59). */
  def increment(name: String, value: Long = 1, tags: Seq[(String, String)] = Nil): Unit =
    send(s"${prefix}_$name:$value|c${tagSuffix(tags)}")

  /** Millisecond timer around a block ≙ send_time_metric with use_ms
    * (monitoring.py:28-42,68-77); returns the block's result and still
    * emits on failure (the reference's decorator times the call path).
    */
  def time[T](name: String, tags: Seq[(String, String)] = Nil)(op: => T): T = {
    val t0 = System.nanoTime()
    try op
    finally send(s"${prefix}_$name:${(System.nanoTime() - t0) / 1e6}|ms${tagSuffix(tags)}")
  }

  /** The reference's per-run emission set (etl.py:179-259 +
    * clickhouse.py:122): processed counts, the no-metric issue gauge,
    * per-table inserted rows, upload status (1 = ok, 2 = failed), and
    * the last-update timestamp. `nowEpochSeconds` is injectable so tests
    * (and replays) are deterministic.
    */
  def emitRunStats(stats: IssuePipeline.RunStats,
                   nowEpochSeconds: Long = System.currentTimeMillis() / 1000): Unit = {
    increment("issues_total_processed_count", stats.issuesProcessed)
    gauge("issues_without_metrics", stats.issuesWithoutMetrics.toDouble)
    gauge("inserted_rows", stats.issuesProcessed.toDouble, Seq("table" -> "issues"))
    gauge("inserted_rows", stats.metricsRows.toDouble, Seq("table" -> "issue_metrics"))
    gauge("inserted_rows", stats.changelogRows.toDouble, Seq("table" -> "issues_changelog"))
    gauge("etl_upload_status", if (stats.uploaded) 1 else 2)
    gauge("last_update_timestamp", nowEpochSeconds.toDouble)
  }

  override def close(): Unit = socket.close()
}
