package graft
import org.apache.spark.sql.SparkSession
import graft.operators.Dedup
import graft.sources.Tables
object Scratch {
  def time[T](name: String)(op: => T): T = {
    val t0 = System.nanoTime(); val r = op
    println(f"[scratch] $name: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
  }
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = Tables.documents(spark, d)
    docs.count()
    time("shingle explode only") {
      import org.apache.spark.sql.functions._
      docs.select(col("doc_id"), explode(Dedup.shingles(col("text"), 3)).as("sh")).count()
    }
    time("minhash signatures")(Dedup.minHashSignatures(docs, "text", "doc_id").count())
    time("minhash candidates")(Dedup.minHashCandidates(docs, "text", "doc_id").count())
    time("minhash pairs")(Dedup.minHashPairs(docs, "text", "doc_id", 0.5).count())
    time("simhash fp")(Dedup.simHash(docs, "text", "doc_id").count())
    time("simhash pairs")(Dedup.simHashPairs(docs, "text", "doc_id").count())
    spark.stop()
  }
}
