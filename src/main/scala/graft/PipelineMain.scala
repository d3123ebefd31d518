package graft

import org.apache.spark.sql.SparkSession

import graft.pipeline.IssuePipeline
import graft.schema.EngineConfig
import graft.sinks.{ConsoleSink, ParquetSink}
import graft.state.StateStore

/** CLI entry ≙ the reference's `tracker-exporter --run-once`
  * (main.py:127-147): one micro-batch of the issue pipeline.
  *
  * Usage: PipelineMain <rawIssues.(json|parquet)> <outDir> [stateUri]
  *   - rawIssues: newline-delimited JSON or parquet in the
  *     [[graft.schema.Schemas.rawIssue]] shape
  *   - outDir: parquet sink base dir ("console" → dry-run S9 sink)
  *   - stateUri: optional watermark KV → stateful incremental scan;
  *     a file/S3 path, or `redis://host[:port][/namespace]`
  *
  * Configuration binds from the `EXPORTER_*` environment exactly like
  * the reference (config.py:246-250; see [[EngineConfig.fromEnv]]), so
  * the deployment DEFAULT is the reference's sliding 2h window —
  * `Updated >= now() − 2h` — which exports nothing from an archival
  * file. Set EXPORTER_TRACKER__SEARCH__RANGE (e.g. `4w`), an explicit
  * EXPORTER_TRACKER__SEARCH__QUERY (`"true"` scans everything), or pass
  * a stateUri for watermark mode.
  */
object PipelineMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: PipelineMain <rawIssues> <outDir> [stateFile]")
    val Array(rawPath, outDir) = args.take(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // P9: malformed JSON rows go to a bad-record side channel instead of
    // failing the batch (reference skips-and-logs per issue, etl.py:180-183).
    val raw =
      if (rawPath.endsWith(".json") || rawPath.endsWith(".ndjson")) {
        val (good, bad) = graft.sources.RawIssueSource.jsonWithBadRecords(spark, rawPath)
        val nBad = bad.count()
        if (nBad > 0) System.err.println(s"[pipeline] $nBad malformed source rows skipped")
        good
      } else spark.read.parquet(rawPath)

    val sink = if (outDir == "console") new ConsoleSink() else new ParquetSink(outDir)
    val state = args.lift(2).map(StateStore.fromUri)
    // a stateUri on the command line IS the stateful opt-in (≙ EXPORTER_STATEFUL)
    val cfg = {
      val c = EngineConfig.fromEnv()
      if (state.isDefined) c.copy(stateful = true) else c
    }
    val mode =
      if (cfg.search.query.isDefined) s"explicit query ${cfg.search.query.get}"
      else if (cfg.stateful || state.isDefined) s"stateful (initial range ${cfg.statefulInitialRange.getOrElse("-")})"
      else s"window (queues=${cfg.search.queues.mkString(",")} range=${cfg.search.range.getOrElse("-")})"
    System.err.println(s"[pipeline] scan mode: $mode")
    val stats = IssuePipeline.run(raw, cfg, sink, state)
    println(s"[pipeline] issues=${stats.issuesProcessed} metrics=${stats.metricsRows} " +
      s"changelog=${stats.changelogRows} no_metrics=${stats.issuesWithoutMetrics} " +
      s"watermark=${stats.newWatermark.getOrElse("-")} uploaded=${stats.uploaded}")
    spark.stop()
  }
}
