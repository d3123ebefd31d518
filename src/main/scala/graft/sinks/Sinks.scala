package graft.sinks

import org.apache.spark.sql.DataFrame

/** Output seam ≙ the reference's load stage (etl.py:193-200). */
trait Sink extends Serializable {
  def write(df: DataFrame, table: String): Unit
}

/** Parquet sink for tests/goldens and offline corpora. */
final class ParquetSink(baseDir: String) extends Sink {
  def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite").parquet(s"$baseDir/$table")
}

/** Bucketed parquet sink — the co-location story of SCALING.md made
  * executable: the pipeline's three tables share `issue_key`-family
  * keys, and writing them bucketed on that key (hive-bucketed parquet
  * via `bucketBy` + `saveAsTable`) lets every downstream equi-join and
  * re-export dedup read both sides pre-partitioned — Catalyst plans the
  * join with ZERO Exchange operators (asserted in SinksSpec). At 100 TB
  * that deletes the dominant shuffle of every issues⋈metrics /
  * issues⋈changelog readback; the write itself costs one clustering
  * pass, amortized across every consumer.
  *
  * Both sides must agree on bucket COUNT and key (the Spark bucketing
  * contract); `spark.sql.sources.bucketing.enabled` (default true) and
  * AQE leave bucketed scans un-coalesced.
  */
final class BucketedTableSink(buckets: Int, keys: Seq[String]) extends Sink {
  def write(df: DataFrame, table: String): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}

/** S9 console sink (dry run, etl.py:260-264). */
final class ConsoleSink(rows: Int = 20) extends Sink {
  def write(df: DataFrame, table: String): Unit = {
    println(s"== $table")
    df.show(rows, truncate = false)
  }
}

/** Exponential backoff ≙ the reference's `backoff` decorator
  * (utils/helpers.py:149-186; defaults config.py:57-60: base 0.5 s,
  * factor 2.5, 3 tries, jitter).
  */
object Retry {
  def withBackoff[T](tries: Int = 3, baseDelayMs: Long = 500, factor: Double = 2.5,
                     jitter: Boolean = true, seed: Option[Long] = None)(op: => T): T = {
    // unseeded by default — a fixed seed would give every partition the
    // identical "jitter", defeating its thundering-herd purpose
    val rnd = seed.map(new scala.util.Random(_)).getOrElse(new scala.util.Random())
    var attempt = 0
    var delay = baseDelayMs.toDouble
    while (true) {
      // Only NonFatal errors are retried: sleeping through an OutOfMemoryError
      // (or swallowing an InterruptedException — an executor kill signal
      // inside foreachPartition) would mask conditions retrying cannot fix.
      try return op
      catch {
        case e: InterruptedException =>
          Thread.currentThread().interrupt()
          throw e
        case scala.util.control.NonFatal(e) =>
          attempt += 1
          if (attempt >= tries) throw e
          val sleep = delay + (if (jitter) rnd.nextDouble() * delay * 0.1 else 0.0)
          try Thread.sleep(sleep.toLong)
          catch {
            case ie: InterruptedException =>
              Thread.currentThread().interrupt()
              ie.addSuppressed(e)
              throw ie
          }
          delay *= factor
      }
    }
    throw new IllegalStateException("unreachable")
  }
}

/** S6/S7: raw-SQL client ≙ ClickhouseClient (services/clickhouse.py:72-128)
  * — arbitrary statement execution behind the retry policy, plus the
  * explicit `OPTIMIZE TABLE ... FINAL` dedup compaction trigger. In this
  * engine dedup is a first-class operator (Dedup.latestByKey) applied
  * before the sink, so `deduplicate` exists for wire-compatibility with
  * deployments that still rely on storage-side collapse.
  */
final class ClickHouseClient(transport: String => String, tries: Int = 3,
                             baseDelayMs: Long = 500) {
  def execute(sql: String): String =
    Retry.withBackoff(tries = tries, baseDelayMs = baseDelayMs)(transport(sql))
  def deduplicate(database: String, table: String): String =
    execute(s"OPTIMIZE TABLE $database.$table FINAL")
}

/** ClickHouse batch-insert sink ≙ `insert_batch`
  * (services/clickhouse.py:110-123): rows serialized to JSONEachRow, one
  * `INSERT INTO db.table FORMAT JSONEachRow` statement per batch, retried
  * with exponential backoff (:72-107). The HTTP/JDBC transport is a
  * pluggable `String => Unit` so tests (and environments without a
  * ClickHouse) can capture statements; a real deployment passes an HTTP
  * POST or JDBC statement executor.
  *
  * Scale note: batching is per executor partition (`foreachPartition`),
  * not a driver-side collect — each of N partitions independently issues
  * `ceil(rows/batchSize)` inserts, so the sink throughput scales with the
  * cluster instead of the driver's memory (the reference materializes the
  * whole payload in RAM, etl.py:135-137).
  *
  * P11 null-date cleanup (`fix_null_dates`, utils/helpers.py:76-87) is
  * inherited for free: `df.toJSON` omits null fields entirely, so null
  * date columns are absent from the JSONEachRow payload and ClickHouse
  * applies its column DEFAULTs — exactly the reference's behavior.
  */
final class ClickHouseBatchSink(
    execute: String => Unit,
    database: String = "agile",
    batchSize: Int = 10000,
    tries: Int = 3) extends Sink {

  def write(df: DataFrame, table: String): Unit = {
    val exec = execute
    val db = database
    val bs = batchSize
    val t = tries
    df.toJSON.foreachPartition { (rows: Iterator[String]) =>
      rows.grouped(bs).foreach { batch =>
        val sql = s"INSERT INTO $db.$table FORMAT JSONEachRow ${batch.mkString(" ")}"
        Retry.withBackoff(tries = t)(exec(sql))
      }
    }
  }
}
