package graft.operators

import java.sql.Timestamp

import graft.SparkSuite

class AttributionSpec extends SparkSuite {
  import spark.implicits._

  private def ts(m: Int) = new Timestamp(1700000000000L + m * 60000L)

  test("transitionCounts: START/first, truncation at first conversion, END for non-converters") {
    val ev = Seq(
      // user 1 converts at step 3; the trailing click must be dropped
      (1L, "click", ts(1), 1L), (1L, "view", ts(2), 2L),
      (1L, "purchase", ts(3), 3L), (1L, "click", ts(4), 4L),
      // user 2 never converts: closes with END
      (2L, "view", ts(1), 5L), (2L, "click", ts(2), 6L)
    ).toDF("user_id", "event_type", "t", "eid")
    val got = Attribution.transitionCounts(ev, "user_id", "event_type", "t", "eid", "purchase")
      .as[(String, String, Long)].collect().toSet
    assert(got == Set(
      ("START", "click", 1L), ("click", "view", 1L), ("view", "purchase", 1L),
      ("START", "view", 1L), ("view", "click", 1L), ("click", "END", 1L)))
  }

  test("removalEffects: hand-solvable two-channel chain") {
    // journey A: click -> purchase (converts); journey B: view -> end.
    // p(conv) = 1/2; removing click kills all conversion, removing view
    // changes nothing.
    val ev = Seq(
      (1L, "click", ts(1), 1L), (1L, "purchase", ts(2), 2L),
      (2L, "view", ts(1), 3L)
    ).toDF("user_id", "event_type", "t", "eid")
    val got = Attribution.removalEffects(ev, "user_id", "event_type", "t", "eid", "purchase")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    val half = 1L << 39
    assert(got == Seq(
      ("click", half, 0L, 1L << 20),
      ("view", half, half, 0L)))
  }

  test("removalEffects: cyclic chain matches an independent 16-sweep fixed-point replay") {
    // click <-> view cycle with stochastic exits: exercises the Jacobi
    // iteration beyond DAG journeys
    val ev = (0L until 12L).flatMap { u =>
      val seq = u % 4 match {
        case 0 => Seq("click", "view", "purchase")
        case 1 => Seq("click", "view", "click")
        case 2 => Seq("view", "click", "purchase")
        case _ => Seq("view", "error")
      }
      seq.zipWithIndex.map { case (t, i) => (u, t, ts(i), u * 10 + i) }
    }.toDF("user_id", "event_type", "t", "eid")
    val cells = Attribution.transitionCounts(ev, "user_id", "event_type", "t", "eid", "purchase")
      .as[(String, String, Long)].collect()
      .map { case (f, t, c) => (f, t) -> c }.toMap
    val tot = cells.groupBy(_._1._1).map { case (f, m) => f -> m.values.sum }
    val states = (cells.keys.map(_._1) ++ cells.keys.map(_._2)).toSeq.distinct.sorted
    val Grid = BigInt(1L << 40)
    def solve(removed: Option[String]): Long = {
      var v = states.map(s => s -> (if (s == "purchase") Grid else BigInt(0))).toMap
      for (_ <- 1 to 16) {
        v = states.map { s =>
          val nv =
            if (s == "purchase") Grid
            else if (s == "END" || removed.contains(s)) BigInt(0)
            else tot.get(s).fold(BigInt(0)) { t =>
              states.iterator.map(to => BigInt(cells.getOrElse((s, to), 0L)) * v(to)).sum / t
            }
          s -> nv
        }.toMap
      }
      v("START").toLong
    }
    val pFull = solve(None)
    val want = Seq("click", "error", "view").map { c =>
      val pRem = solve(Some(c))
      (c, pFull, pRem,
        (BigInt(pFull - pRem) * BigInt(1L << 20) / BigInt(pFull)).toLong)
    }
    val got = Attribution.removalEffects(ev, "user_id", "event_type", "t", "eid", "purchase")
      .as[(String, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
  }
}
