package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.{AnnGraph, Similarity}

/** Scratch parameter sweep for the graph-ANN quality (dev aid). */
object AnnGraphTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val q = emb.where(col("vec_id") < 10)
    val brute = Similarity.bruteForceTopK(emb, q, k = 10)
    brute.persist().count()
    for (degree <- Seq(6, 8); rounds <- Seq(2, 3)) {
      val g = AnnGraph.buildGraph(emb, degree = degree, rounds = rounds)
      for ((beam, sr) <- Seq((12, 3), (16, 3), (24, 3))) {
        val approx = AnnGraph.beamSearch(g, emb, q, k = 10, beam = beam, rounds = sr)
        val rec = Similarity.recallAtK(approx, brute)
          .agg(avg(col("recall_pct"))).collect()(0).getDouble(0)
        println(f"DEBUG degree=$degree rounds=$rounds beam=$beam sr=$sr recall=$rec%.1f")
      }
    }
    spark.stop()
  }
}
