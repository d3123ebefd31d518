package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Readers for the synthetic test corpus (TESTDATA.md): one parquet file
  * per table under a scale-factor directory.
  *
  * This is the engine's offline-source seam (SURVEY.md §2.1 S1): the
  * reference scans a REST API with a pushed-down predicate; here the scan
  * is a parquet read and Catalyst pushes filters/projection into the scan
  * (`PushedFilters`/`ReadSchema`). A live REST source would implement the
  * same `RawIssueSource` seam (graft.pipeline.IssuePipeline's input)
  * without touching query code.
  */
object Tables {
  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def lineitem(s: SparkSession, d: String): DataFrame = read(s, d, "lineitem")
  def orders(s: SparkSession, d: String): DataFrame = read(s, d, "orders")
  def customer(s: SparkSession, d: String): DataFrame = read(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = read(s, d, "supplier")
  def nation(s: SparkSession, d: String): DataFrame = read(s, d, "nation")
  def region(s: SparkSession, d: String): DataFrame = read(s, d, "region")
  def part(s: SparkSession, d: String): DataFrame = read(s, d, "part")
  /** `events.ts` is nanosecond-precision parquet, read as long nanos under
    * `spark.sql.legacy.parquet.nanosAsLong=true`. Normalize to Spark's
    * micro-precision TimestampType with integer `div` — double division
    * loses exactness above 2^53 (epoch nanos ≈ 1.7e18, ULP ≈ 256 ns) and
    * would drift ±1 µs from DuckDB's exact truncation of the same file.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = read(s, d, "events")
    raw.schema("ts").dataType.typeName match {
      case "long" => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case _      => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
