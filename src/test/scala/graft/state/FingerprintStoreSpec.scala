package graft.state

import java.nio.file.Files

import graft.SparkSuite
import graft.operators.Dedup

class FingerprintStoreSpec extends SparkSuite {

  import spark.implicits._

  private def freshDir(): String = {
    val d = Files.createTempDirectory("fpstore").toFile
    d.delete() // the store creates it on first append
    d.getPath
  }

  test("load on a missing store is empty; append then load round-trips distinct fingerprints") {
    val dir = freshDir()
    assert(FingerprintStore.load(spark, dir).count() == 0)
    FingerprintStore.append(Seq("a", "b", "b").toDF("fingerprint"), dir)
    FingerprintStore.append(Seq("b", "c").toDF("fingerprint"), dir)
    // cross-delta duplicates are allowed (consumers anti-join) but each
    // delta is internally distinct
    val got = FingerprintStore.load(spark, dir).as[String].collect().toSeq
    assert(got.sorted == Seq("a", "b", "b", "c"))
  }

  test("compact collapses deltas to the distinct set and survives re-running") {
    val dir = freshDir()
    FingerprintStore.append(Seq("a", "b").toDF("fingerprint"), dir)
    FingerprintStore.append(Seq("b", "c").toDF("fingerprint"), dir)
    FingerprintStore.compact(spark, dir)
    assert(FingerprintStore.load(spark, dir).as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    FingerprintStore.compact(spark, dir) // set-preserving, idempotent
    assert(FingerprintStore.load(spark, dir).as[String].collect().sorted.toSeq == Seq("a", "b", "c"))
    // compaction leaves no working dirs behind
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(n => n.contains(".compact.")), parent.mkString(","))
  }

  test("incrementalDedupRun: run 2 drops run 1's documents via the persisted store") {
    val dir = freshDir()
    val run1 = Seq((1L, "alpha text"), (2L, "beta text")).toDF("doc_id", "text")
    val out1 = Dedup.incrementalDedupRun(run1, dir, "text", "doc_id")(_ => ())
    assert(out1.select("doc_id").as[Long].collect().sorted.toSeq == Seq(1L, 2L))
    FingerprintStore.compact(spark, dir)
    // run 2: one re-ingested copy (beta), one in-batch dup pair (gamma), one novel
    val run2 = Seq(
      (10L, "beta text"), (11L, "gamma text"), (12L, "gamma text"), (13L, "delta text")
    ).toDF("doc_id", "text")
    val out2 = Dedup.incrementalDedupRun(run2, dir, "text", "doc_id")(_ => ())
    assert(out2.select("doc_id").as[Long].collect().sorted.toSeq == Seq(11L, 13L))
    // the store now also holds run 2's survivors: a run 3 replay of the
    // same batch drops EVERYTHING (idempotent re-run after a crash
    // between write and commit)
    val out3 = Dedup.incrementalDedupRun(run2, dir, "text", "doc_id")(_ => ())
    assert(out3.count() == 0)
  }

  test("incrementalDedupRun commits AFTER the write, and the write sees load-time store state") {
    val dir = freshDir()
    var sawAtWrite = -1L
    Dedup.incrementalDedupRun(
      Seq((1L, "one"), (2L, "two")).toDF("doc_id", "text"), dir, "text", "doc_id") { novel =>
      // inside the write the store must still be EMPTY (commit happens after)
      sawAtWrite = FingerprintStore.load(spark, dir).count()
      assert(novel.count() == 2)
    }
    assert(sawAtWrite == 0L)
    assert(FingerprintStore.load(spark, dir).count() == 2)
  }

  test("a failed downstream write aborts the run BEFORE the commit (crash contract)") {
    val dir = freshDir()
    val boom = intercept[RuntimeException] {
      Dedup.incrementalDedupRun(
        Seq((1L, "doomed doc")).toDF("doc_id", "text"), dir, "text", "doc_id") { _ =>
        throw new RuntimeException("sink down")
      }
    }
    assert(boom.getMessage == "sink down")
    // nothing committed: the re-run sees an empty store and re-emits
    assert(FingerprintStore.load(spark, dir).count() == 0)
    val retry = Dedup.incrementalDedupRun(
      Seq((1L, "doomed doc")).toDF("doc_id", "text"), dir, "text", "doc_id")(_ => ())
    assert(retry.count() == 1)
  }

  test("returned frame is pinned to load-time state (eager checkpoint), not re-planned post-commit") {
    val dir = freshDir()
    val out = Dedup.incrementalDedupRun(
      Seq((1L, "solo")).toDF("doc_id", "text"), dir, "text", "doc_id")(_ => ())
    // after the commit the store contains this row's fingerprint; a lazy
    // plan would anti-join it away on re-evaluation
    assert(out.count() == 1)
    assert(out.count() == 1)
  }
}
