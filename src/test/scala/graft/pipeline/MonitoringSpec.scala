package graft.pipeline

import java.net.{DatagramPacket, DatagramSocket, SocketTimeoutException}
import java.nio.charset.StandardCharsets.UTF_8

import org.scalatest.funsuite.AnyFunSuite

class MonitoringSpec extends AnyFunSuite {

  private def withReceiver[T](f: (Int, () => String) => T): T = {
    val rx = new DatagramSocket()
    rx.setSoTimeout(2000)
    def recv(): String = {
      val p = new DatagramPacket(new Array[Byte](8192), 8192)
      rx.receive(p)
      new String(p.getData, 0, p.getLength, UTF_8)
    }
    try f(rx.getLocalPort, recv _) finally rx.close()
  }

  test("gauge/count/timing lines follow the DogStatsD wire format with tags") {
    withReceiver { (port, recv) =>
      val m = new StatsdEmitter("127.0.0.1", port, prefix = "tracker_exporter",
        baseTags = Seq("env" -> "test"))
      try {
        m.gauge("issues_without_metrics", 3)
        assert(recv() == "tracker_exporter_issues_without_metrics:3|g|#env:test")
        m.gauge("ratio", 0.5, Seq("q" -> "a"))
        assert(recv() == "tracker_exporter_ratio:0.5|g|#env:test,q:a")
        m.increment("issues_total_processed_count", 7)
        assert(recv() == "tracker_exporter_issues_total_processed_count:7|c|#env:test")
        val out = m.time("etl_duration_seconds")(42)
        assert(out == 42)
        val line = recv()
        assert(line.matches("""tracker_exporter_etl_duration_seconds:\d+(\.\d+)?\|ms\|#env:test"""), line)
      } finally m.close()
    }
  }

  test("emitRunStats sends the reference's per-run metric set (etl.py:179-259)") {
    withReceiver { (port, recv) =>
      val m = new StatsdEmitter("127.0.0.1", port, prefix = "te")
      try {
        m.emitRunStats(IssuePipeline.RunStats(
          issuesProcessed = 10, metricsRows = 25, changelogRows = 40,
          issuesWithoutMetrics = 2, newWatermark = Some("2024-01-09"), uploaded = true),
          nowEpochSeconds = 1704790800L)
        val lines = (1 to 7).map(_ => recv()).toSet
        assert(lines == Set(
          "te_issues_total_processed_count:10|c",
          "te_issues_without_metrics:2|g",
          "te_inserted_rows:10|g|#table:issues",
          "te_inserted_rows:25|g|#table:issue_metrics",
          "te_inserted_rows:40|g|#table:issues_changelog",
          "te_etl_upload_status:1|g",
          "te_last_update_timestamp:1704790800|g"))
      } finally m.close()
    }
  }

  test("disabled emitter sends nothing and timing still returns the result") {
    withReceiver { (port, recv) =>
      val m = new StatsdEmitter("127.0.0.1", port, enabled = false)
      try {
        m.gauge("g", 1)
        m.increment("c")
        assert(m.time("t")("result") == "result")
        intercept[SocketTimeoutException](recv())
      } finally m.close()
    }
  }
}
