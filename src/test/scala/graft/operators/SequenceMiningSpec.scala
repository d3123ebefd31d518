package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class SequenceMiningSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("covisitTopK: hand-computed transition counts, self-loops dropped, rank ties by dst") {
    // u1: 1 -> 2 -> 1 -> 2 -> 2(refresh) -> 3 ; u2: 1 -> 2
    val ev = Seq(
      (1L, ts(0), 1L, 1L), (1L, ts(1), 2L, 2L), (1L, ts(2), 3L, 1L),
      (1L, ts(3), 4L, 2L), (1L, ts(4), 5L, 2L), (1L, ts(5), 6L, 3L),
      (2L, ts(0), 7L, 1L), (2L, ts(1), 8L, 2L))
      .toDF("user_id", "ts", "event_id", "item")
    val out = SequenceMining.covisitTopK(ev, "user_id", "ts", "event_id", "item", 3)
      .as[(Long, Int, Long, Long)].collect().toSet
    // counts: (1->2): 3, (2->1): 1, (2->3): 1 — tie broken by dst asc
    assert(out == Set(
      (1L, 1, 2L, 3L),
      (2L, 1, 1L, 1L),
      (2L, 2, 3L, 1L)))
  }

  test("covisitTopK is invariant under repartitioning") {
    val rnd = new scala.util.Random(17)
    val ev = (0 until 500).map(i =>
      (rnd.nextInt(5).toLong, ts(i), i.toLong, rnd.nextInt(8).toLong))
      .toDF("user_id", "ts", "event_id", "item")
    def run(parts: Int) =
      SequenceMining.covisitTopK(ev.repartition(parts), "user_id", "ts", "event_id", "item", 3)
        .as[(Long, Int, Long, Long)].collect().toSet
    assert(run(1) == run(13))
  }

  test("pathCounts: hand-computed 2-step paths, incomplete windows excluded") {
    // u1: a b a b ; u2: b a
    val ev = Seq(
      (1L, ts(0), 1L, "a"), (1L, ts(1), 2L, "b"),
      (1L, ts(2), 3L, "a"), (1L, ts(3), 4L, "b"),
      (2L, ts(0), 5L, "b"), (2L, ts(1), 6L, "a"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val out = SequenceMining.pathCounts(ev, "user_id", "ts", "event_id", "event_type",
      steps = 2, topN = 10)
      .as[(String, String, Long)].collect().toSeq
    // paths: u1 -> (a,b) (b,a) (a,b); u2 -> (b,a)
    assert(out == Seq(("a", "b", 2L), ("b", "a", 2L)))
  }

  test("pathCounts: 3-step run matches a sliding-window reference on a random stream") {
    val rnd = new scala.util.Random(5)
    val raw = (0 until 400).map(i =>
      (rnd.nextInt(4).toLong, ts(i), i.toLong, s"e${rnd.nextInt(3)}"))
    val want = raw.groupBy(_._1).values.flatMap { evs =>
      evs.sortBy(_._3).map(_._4).sliding(3).filter(_.size == 3).map(s => (s(0), s(1), s(2)))
    }.toSeq.groupBy(identity).view.mapValues(_.size.toLong).toSeq
      .sortBy { case ((a, b, c), n) => (-n, a, b, c) }.take(10)
      .map { case ((a, b, c), n) => (a, b, c, n) }
    val got = SequenceMining.pathCounts(raw.toDF("user_id", "ts", "event_id", "event_type"),
      "user_id", "ts", "event_id", "event_type", steps = 3, topN = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(got == want)
  }
}
