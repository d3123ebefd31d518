package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.schema.Schemas

/** Raw-issue source seam (SURVEY.md §2.1 S1): the pipeline consumes a
  * DataFrame in the [[Schemas.rawIssue]] shape from any provider — offline
  * parquet/JSON corpora here; a live REST fetch (driver-side paging +
  * 10k-cap warning, reference services/tracker.py:50-67) would implement
  * the same trait without touching transform code.
  */
trait RawIssueSource {
  def load(spark: SparkSession): DataFrame
}

object RawIssueSource {

  final case class Parquet(path: String) extends RawIssueSource {
    def load(spark: SparkSession): DataFrame = spark.read.parquet(path)
  }

  final case class Json(path: String) extends RawIssueSource {
    def load(spark: SparkSession): DataFrame =
      spark.read.schema(Schemas.rawIssue).json(path)
  }

  /** Live REST adapter skeleton — S1's online path (reference
    * services/tracker.py:50-67) behind the same seam. Transport is
    * INJECTED: `fetchPage(page, perPage)` returns one page of raw-issue
    * JSON documents, None or empty = exhausted. This container has zero
    * egress, so no HTTP client ships here; a production impl binds
    * fetchPage to the tracker's search endpoint with retry/backoff (the
    * engine's backoff discipline lives in graft.sinks.Sinks.withRetry).
    *
    * Scale notes: the page loop is driver-side BY NECESSITY (a paged
    * search API is a sequential cursor), and the accumulation is bounded
    * by the API itself — the reference's search hard limit is 10k issues
    * per query (services/tracker.py:58-65), which is why its ETL slices
    * work into watermark/range windows rather than big scans. `countHint`
    * mirrors the reference's count_only pre-flight; crossing the cap
    * emits the same warning. Parsing happens DISTRIBUTED: page strings
    * parallelize to executors and parse against the typed schema there.
    */
  final case class Rest(
      fetchPage: (Int, Int) => Option[Seq[String]],
      perPage: Int = 100,
      countHint: Option[Long] = None,
      searchHardLimit: Long = 10000L) extends RawIssueSource {
    def load(spark: SparkSession): DataFrame = {
      countHint.filter(_ > searchHardLimit).foreach { n =>
        System.err.println(s"[source] search matched $n issues, above the API hard limit " +
          s"$searchHardLimit — the API truncates; narrow the scan window")
      }
      import spark.implicits._
      val docs = Iterator.from(0)
        .map(p => fetchPage(p, perPage).getOrElse(Seq.empty))
        .takeWhile(_.nonEmpty)
        .flatten
        .toSeq
      spark.read.schema(Schemas.rawIssue).json(
        spark.createDataset(docs).repartition(spark.sparkContext.defaultParallelism))
    }
  }

  /** P9 per-row error isolation (reference etl.py:180-183 skips a failed
    * issue and continues): malformed source rows land on a bad-record side
    * channel instead of failing the batch — PERMISSIVE parse with a
    * corrupt-record column, split into (good, bad).
    */
  def jsonWithBadRecords(spark: SparkSession, path: String): (DataFrame, DataFrame) = {
    val schema = Schemas.rawIssue.add("_corrupt_record", "string")
    val parsed = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .cache() // both branches read it; also required for corrupt-record splits
    val good = parsed.where(col("_corrupt_record").isNull).drop("_corrupt_record")
    val bad = parsed.where(col("_corrupt_record").isNotNull).select(col("_corrupt_record").as("raw"))
    (good, bad)
  }
}
