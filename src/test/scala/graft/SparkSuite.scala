package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.scalatest.funsuite.AnyFunSuite

/** Shared local SparkSession for all suites (same configs as the
  * Verify/Bench mains so behavior matches the driver's runs).
  */
trait SparkSuite extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSuite.session

  /** Evaluate a column expression over a single row. */
  def evalOne(c: Column): Any = {
    val r = spark.range(1).select(c.as("v")).collect()(0)
    if (r.isNullAt(0)) null else r.get(0)
  }
}

object SparkSuite {
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
