package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Schema profiling for semi-structured JSON columns — the
  * discovery pass run before committing a parse schema for a raw event
  * feed: which keys exist, how often, and what scalar type their values
  * carry (a key that is `long` in 99.9% of rows and `string` in the
  * rest is the classic upstream-producer drift signal).
  */
object JsonProfile {

  /** Per top-level key of `jsonCol`: presence count and value-type
    * census (bool / long / double / string — classified from the
    * scalar rendering, first match in that order). Emits
    * (key, n_present, n_bool, n_long, n_double, n_string).
    *
    * Plan: one `from_json` to `map<string,string>` (no schema needed —
    * the point is we don't HAVE one yet), one bounded explode (fan-out
    * = keys per document), one map-side-combined aggregate to
    * #distinct-keys rows. The corpus is scanned once; nothing is ever
    * wider than (key, value-string).
    */
  def profile(df: DataFrame, jsonCol: String): DataFrame = {
    val isBool = col("_v") === "true" || col("_v") === "false"
    val isLong = col("_v").rlike("^-?\\d+$")
    val isDouble = col("_v").rlike("^-?\\d+\\.\\d+([eE][+-]?\\d+)?$")
    df.select(explode(from_json(col(jsonCol),
        org.apache.spark.sql.types.DataType.fromDDL("map<string,string>")))
        .as(Seq("key", "_v")))
      .where(col("_v").isNotNull)
      .groupBy(col("key"))
      .agg(
        count(lit(1)).as("n_present"),
        sum(when(isBool, 1L).otherwise(0L)).as("n_bool"),
        sum(when(!isBool && isLong, 1L).otherwise(0L)).as("n_long"),
        sum(when(!isBool && !isLong && isDouble, 1L).otherwise(0L)).as("n_double"),
        sum(when(!isBool && !isLong && !isDouble, 1L).otherwise(0L)).as("n_string"))
  }
}
