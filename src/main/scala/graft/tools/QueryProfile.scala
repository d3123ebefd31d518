package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Job-wave / stage profiler for declared queries (dev aid, guide §1):
  * runs each SPARK_GRAFT_ONLY query twice (warm JIT) and prints, for
  * the SECOND run, its wall seconds, the number of Spark JOBS it
  * launched (the "sequential job waves" the optimization rounds hunt —
  * every eager cut, bounded collect, and broadcast build is one), and
  * the number of completed stages (≈ exchanges + result stages).
  * Numbers land on stdout as one JSON line per query.
  *
  * Usage:
  *   SPARK_GRAFT_ONLY=ann_graph,graph_hits SPARK_GRAFT_SF_DIR=... \
  *     SPARK_GRAFT_CPUS=32 sbt -batch "runMain graft.tools.QueryProfile"
  */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
      .getOrElse(Seq.empty)
    require(only.nonEmpty, "set SPARK_GRAFT_ONLY to the queries to profile")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val stages = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    only.foreach { name =>
      val fn = graft.SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      spark.sparkContext.setJobDescription(s"profile: $name")
      try {
        fn(spark, sfDir).count() // warm run
        spark.catalog.clearCache()
        // settle the listener bus so the warm run's events don't bleed
        Thread.sleep(300)
        jobs.set(0); stages.set(0)
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        val sec = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300) // let stage-completed events drain
        println(f"""{"q":"$name","sec":$sec%.3f,"jobs":${jobs.get},""" +
          s""""stages":${stages.get},"rows":$n}""")
        spark.catalog.clearCache()
      } catch {
        case NonFatal(e) =>
          println(s"""{"q":"$name","err":"${e.getClass.getSimpleName}"}""")
      }
    }
    spark.stop()
  }
}
