package graft.state

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Persisted content-fingerprint store backing cross-run exact dedup
  * ([[graft.operators.Dedup.incrementalDedupRun]]) — the content-identity
  * analog of the watermark state store: where [[StateStore]] remembers
  * "how far we scanned", this remembers "what we already ingested".
  *
  * Layout: one parquet dataset (single `fingerprint` STRING column) that
  * each run APPENDS its novel fingerprints to as a new delta of part
  * files, plus an explicit [[compact]] that rewrites the accumulated
  * deltas into one distinct snapshot and swaps it in via FS renames.
  * The Hadoop FS API keeps file:// and s3a:// behavior identical (the
  * same trade [[FileStateStore]] makes).
  *
  * Crash contract (the commit-after-write ordering of
  * [[graft.pipeline.IssuePipeline]], etl.py:242-256 in the reference):
  * callers append fingerprints only AFTER the deduped batch landed
  * downstream, so a crash between the two leaves the store MISSING
  * fingerprints — the re-run re-emits those documents and the
  * downstream latest-version dedup collapses them — never the reverse
  * (fingerprints present, data lost: those documents would be silently
  * dropped forever). A crash mid-[[compact]] leaves either the old
  * generation or the new one (the swap is two renames guarded by a
  * completed snapshot write); at worst the aside copy needs a manual
  * sweep, and re-compacting is always safe because compaction never
  * changes the fingerprint SET.
  *
  * Scale: the store is one slim column — at 10¹⁰ documents ≈ a few
  * hundred GB of parquet, read as an ordinary distributed scan by the
  * anti-join (AQE broadcasts it only while it is genuinely small).
  * Compaction is one distinct + rewrite, scheduled (e.g. nightly), so
  * per-run commit cost stays proportional to the BATCH, not the corpus.
  */
object FingerprintStore {

  private val schema = StructType(Seq(StructField("fingerprint", StringType)))

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** The store's fingerprints (possibly with cross-delta duplicates —
    * consumers anti-join, so duplicates are harmless); empty frame when
    * no run has committed yet.
    */
  def load(spark: SparkSession, dir: String): DataFrame =
    if (fs(spark, dir).exists(new Path(dir)))
      spark.read.schema(schema).parquet(dir).select(col("fingerprint"))
    else
      spark.createDataFrame(new java.util.ArrayList[Row](), schema)

  /** Append a run's novel fingerprints as a new delta. Call this AFTER
    * the deduped batch is written downstream (see crash contract above).
    */
  def append(fingerprints: DataFrame, dir: String): Unit =
    fingerprints.select(col("fingerprint").cast("string")).distinct()
      .write.mode("append").parquet(dir)

  /** Rewrite the accumulated deltas as one distinct snapshot:
    * write-to-temp, rename-aside, rename-in, drop-aside. Set-preserving,
    * so it can run (and re-run) at any point between commits.
    */
  def compact(spark: SparkSession, dir: String): Unit = {
    val hfs = fs(spark, dir)
    val cur = new Path(dir)
    if (!hfs.exists(cur)) return
    val tmp = new Path(dir + ".compact.tmp")
    val aside = new Path(dir + ".compact.aside")
    hfs.delete(tmp, true)
    hfs.delete(aside, true)
    spark.read.schema(schema).parquet(dir)
      .select(col("fingerprint")).distinct()
      .write.mode("overwrite").parquet(tmp.toString)
    if (!hfs.rename(cur, aside))
      throw new java.io.IOException(s"compact: cannot move $cur aside")
    if (!hfs.rename(tmp, cur)) {
      hfs.rename(aside, cur) // roll back: old generation stays live
      throw new java.io.IOException(s"compact: cannot activate $tmp")
    }
    hfs.delete(aside, true)
  }
}
