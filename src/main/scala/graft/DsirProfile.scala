package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.{CorpusSelection, QualityClassifier}
import graft.sources.Tables

/** Stage attribution for `select_dsir` (ad-hoc profiling main, the
  * BloomProfile pattern): times each constituent pass in isolation so a
  * regression can be pinned to featurization, the distribution fits,
  * the model-grid build, or the scoring join.
  */
object DsirProfile {
  private def time[A](label: String)(f: => A): Unit = {
    val t0 = System.nanoTime()
    f
    println(f"[dsir] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
  }

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    val target = Tables.documents(spark, d).where(col("source") === "src0")
      .select(col("doc_id"), col("text"))
    // JIT warm
    QualityClassifier.scoreHashModel(docs, "text", "doc_id").count()

    time("classifier (reference)") {
      QualityClassifier.scoreHashModel(docs, "text", "doc_id").count()
    }
    time("dsirScores") {
      CorpusSelection.dsirScores(docs, target, "text", "doc_id").count()
    }
    time("selectByDsir") {
      CorpusSelection.selectByDsir(docs, target, "text", "doc_id", 100).count()
    }
    spark.stop()
  }
}
