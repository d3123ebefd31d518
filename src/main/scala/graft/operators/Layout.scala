package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.graft.{ColumnBridge => ExpressionUtils}
import org.apache.spark.sql.functions._

import graft.plans.{HilbertCode, MortonCode}

/** Physical-layout operators — the write-side levers that decide how
  * much a 100 TB table costs to READ later: a scan's price is the
  * files (and row groups) whose min/max statistics cannot rule the
  * predicate out, and min/max quality is purely a function of how rows
  * were clustered at write time.
  *
  *   - Lexicographic sort on column A: perfect pruning on A, none on B
  *     (every file spans B's whole range).
  *   - [[zorderLayout]] (Morton / Z-order): both dimensions stay
  *     locally clustered, so predicates on EITHER column prune —
  *     the `ZORDER BY` of Delta/Iceberg, expressed as plain
  *     `repartitionByRange + sortWithinPartitions` on the interleaved
  *     code ([[graft.plans.MortonCode]]).
  *
  * [[fileRanges]] + [[prunableFraction]] measure the claim instead of
  * asserting it: per-file min/max audit → the fraction of files a
  * range predicate could skip. LayoutSpec pins z-order strictly
  * beating the single-column sort on the second dimension.
  */
object Layout {

  /** Morton code column — see [[graft.plans.MortonCode]]. Both inputs
    * must already fit `bits` (bucket or hash wider domains first).
    */
  def mortonCode(a: Column, b: Column, bits: Int): Column =
    ExpressionUtils.column(MortonCode(
      ExpressionUtils.expression(a.cast("long")),
      ExpressionUtils.expression(b.cast("long")), bits))

  /** Cluster `df` into `numFiles` range partitions of the Morton code
    * of (`a`, `b`), sorted within each — written as-is, every output
    * file covers a compact Z-curve segment, i.e. a small rectangle (or
    * union of few) in (a, b) space. The range partitioning samples the
    * code distribution, so skewed dimensions still yield balanced
    * files.
    */
  def zorderLayout(df: DataFrame, a: String, b: String, bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("_z", mortonCode(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("_z"))
      .sortWithinPartitions(col("_z"))
      .drop("_z")
  }

  /** Hilbert code column — see [[graft.plans.HilbertCode]]. Both inputs
    * must already fit `bits` (bucket or hash wider domains first).
    */
  def hilbertCode(a: Column, b: Column, bits: Int): Column =
    ExpressionUtils.column(HilbertCode(
      ExpressionUtils.expression(a.cast("long")),
      ExpressionUtils.expression(b.cast("long")), bits))

  /** [[zorderLayout]] with the Hilbert curve as the clustering key —
    * strictly better locality than Z-order (no quadrant-seam jumps:
    * every curve step is Manhattan-adjacent), hence tighter per-file
    * min/max envelopes and more pruning for the same file count. Same
    * plan shape: one codegen'd key, one range exchange, in-partition
    * sort.
    */
  def hilbertLayout(df: DataFrame, a: String, b: String, bits: Int, numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("_h", hilbertCode(col(a), col(b), bits))
      .repartitionByRange(numFiles, col("_h"))
      .sortWithinPartitions(col("_h"))
      .drop("_h")
  }

  /** Per-file min/max audit of a written directory — the statistics a
    * scan's file-skipping consults, surfaced as a query: one row per
    * file with `min_<c>`/`max_<c>` for each audited column. (Reads
    * the data once; production systems get the same numbers free from
    * parquet footers.)
    */
  def fileRanges(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap(c => Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c")))
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Small-file compaction — the OPTIMIZE half of the layout story: a
    * streaming or per-batch writer leaves a directory of tiny files,
    * and every later scan pays per-file open/footer/scheduling costs
    * (the classic small-files problem; at 100 TB it is the difference
    * between thousands and millions of tasks). Rewrites `inDir` to
    * `outDir` in `ceil(actualBytes / targetBytes)` files — the size
    * estimate is EXACT because the input already exists on disk (no
    * compression-ratio guessing; Delta's OPTIMIZE uses the same
    * post-hoc file-size arithmetic). Returns the file count written.
    */
  def compact(spark: SparkSession, inDir: String, outDir: String, targetBytes: Long): Int = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val path = new org.apache.hadoop.fs.Path(inDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val total = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).sum
    require(total > 0, s"no parquet bytes under $inDir")
    val n = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inDir).repartition(n).write.mode("overwrite").parquet(outDir)
    n
  }

  /** Simulated zone-map skip audit across CANDIDATE layouts — the
    * measurement that justifies paying a clustered rewrite before the
    * write happens: for each named layout (a sort-key list), assign
    * rows to `numFiles` simulated files by exact ntile over that order,
    * collect per-file min/max zone maps on (`aCol`, `bCol`), and report
    * per (layout, probe box) how many files a scan could SKIP. The
    * ingestion-order layout scores ~0 on both dimensions, a
    * single-column sort prunes only its own column, and the
    * space-filling-curve layouts prune on both — this query turns that
    * claim into an oracle-checked number per layout.
    *
    * ntile (not repartitionByRange) keeps the file assignment exact and
    * engine-reproducible: this is a MEASUREMENT harness — the
    * production write path is [[zorderLayout]]/[[hilbertLayout]]'s
    * sampled range exchange, whose real zone maps come free from
    * parquet footers ([[fileRanges]]). The global ntile window sorts a
    * slim (a, b, keys) projection only; at audit time one runs it on a
    * sample or a partition, not 100 TB.
    *
    * Sort-key lists must end in a unique tie-break column. Emits
    * (layout, box, n_files, files_hit, skip_fraction).
    */
  def zonemapSkipAudit(df: DataFrame, aCol: String, bCol: String,
                       layouts: Seq[(String, Seq[Column])], numFiles: Int,
                       boxes: Seq[(String, Long, Long, Long, Long)]): DataFrame = {
    require(numFiles >= 2, s"numFiles must be >= 2, got $numFiles")
    require(layouts.nonEmpty && boxes.nonEmpty, "need layouts and boxes")
    import org.apache.spark.sql.expressions.Window
    val ranges = layouts.map { case (name, keys) =>
      df.select(col(aCol).cast("long").as("_a") +: col(bCol).cast("long").as("_b")
          +: keys.zipWithIndex.map { case (k, i) => k.as(s"_k$i") }: _*)
        .withColumn("_file",
          ntile(numFiles).over(Window.orderBy(keys.indices.map(i => col(s"_k$i")): _*)))
        .groupBy(col("_file"))
        .agg(min(col("_a")).as("_mna"), max(col("_a")).as("_mxa"),
          min(col("_b")).as("_mnb"), max(col("_b")).as("_mxb"))
        .select(lit(name).as("layout"), col("_file"),
          col("_mna"), col("_mxa"), col("_mnb"), col("_mxb"))
    }.reduce(_ unionByName _)
    val s = df.sparkSession
    import s.implicits._
    val boxDf = boxes.toDF("box", "_lo_a", "_hi_a", "_lo_b", "_hi_b")
    val hit = col("_mxa") >= col("_lo_a") && col("_mna") <= col("_hi_a") &&
      col("_mxb") >= col("_lo_b") && col("_mnb") <= col("_hi_b")
    ranges.crossJoin(broadcast(boxDf))
      .groupBy(col("layout"), col("box"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(hit, 1L).otherwise(0L)).as("files_hit"))
      .withColumn("skip_fraction",
        (col("n_files") - col("files_hit")).cast("double") / col("n_files").cast("double"))
      .orderBy(col("layout"), col("box"))
  }

  /** Fraction of files a range predicate `lo <= c <= hi` can SKIP
    * given a [[fileRanges]] audit: a file is prunable when its
    * [min, max] misses the query interval entirely.
    */
  def prunableFraction(ranges: DataFrame, c: String, lo: Long, hi: Long): Double = {
    val total = ranges.count()
    require(total > 0, "empty file-range audit")
    val hit = ranges
      .where(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .count()
    (total - hit).toDouble / total.toDouble
  }
}
