package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Readers for the synthetic test corpus (TESTDATA.md): one parquet file
  * per table under a scale-factor directory.
  *
  * This is the engine's offline-source seam (SURVEY.md §2.1 S1): the
  * reference scans a REST API with a pushed-down predicate; here the scan
  * is a parquet read and Catalyst pushes filters/projection into the scan
  * (`PushedFilters`/`ReadSchema`). A live REST source would implement the
  * same `RawIssueSource` seam (see graft.tracker) without touching query
  * code.
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
  def events(s: SparkSession, d: String): DataFrame = read(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = read(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = read(s, d, "embeddings")
}
