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
