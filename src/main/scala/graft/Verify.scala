package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // events.parquet stores TIMESTAMP(NANOS), which Spark 4 refuses by
      // default; read as long nanos and truncate to micros in the reader
      // (graft.sources.Tables.events) — the same truncation DuckDB applies.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // Let AQE coalesce the output partitioning of CACHED plans (off by
      // default): every operator's persist()-cut intermediate otherwise
      // keeps the full shuffle.partitions fan-out however tiny the data,
      // and each downstream pass pays per-task overhead on mostly-empty
      // partitions (r14 measurement: the perceptron's cached feature
      // table at 32 fixed partitions cost 0.45 s PER EPOCH of pure task
      // overhead; AQE-coalesced it is 0.15 s). Data-adaptive by
      // construction — big intermediates keep many partitions, small
      // ones shrink — and results stay partitioning-independent (the
      // engine's exactness discipline; the full oracle gate re-proves
      // it). Same flag in Bench keeps the two surfaces consistent.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // SPARK_GRAFT_ONLY=q1,q2 restricts the dump for isolated oracle
    // iteration (mirrors Bench; the driver never sets it)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").map(_.trim).toSet)
    SparkEntry.queries.filter { case (name, _) => only.forall(_.contains(name)) }.foreach { case (name, fn) =>
      try {
        // Timestamps → TIMESTAMP_NTZ in the dump: the session runs UTC, so
        // the cast is identity on values, but the parquet type then matches
        // DuckDB's timezone-naive TIMESTAMP — otherwise the oracle compare
        // sees tz-aware vs naive dtypes for identical instants.
        val df = fn(spark, sfDir)
        val ntz = df.schema.fields.foldLeft(df) { (acc, f) =>
          if (f.dataType.typeName == "timestamp")
            acc.withColumn(f.name, acc.col(f.name).cast("timestamp_ntz"))
          else acc
        }
        ntz.coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      } finally {
        // Operator-internal persist cuts pin MEMORY_AND_DISK blocks in
        // the session's cache manager; across 100+ queries in one JVM
        // they would accumulate for the process lifetime (mirrors
        // Bench's per-query clear).
        spark.catalog.clearCache()
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .filter { case (k, _) => only.forall(_.contains(k)) }
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }
}
