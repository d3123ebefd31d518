package graft.operators

import graft.SparkSuite

class GraphSpec extends SparkSuite {
  import spark.implicits._

  /** Pure-Scala mirror of the integer power iteration — same grid, same
    * truncating divisions, computed single-threaded. Exact-equality
    * oracle for the distributed loop.
    */
  private def refPageRank(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    val n = nodes.size.toLong
    val init = Graph.RankScale / n
    val base = (init * 15L) / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(_ -> init).toMap
    for (_ <- 1 to iters) {
      val inc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) inc(d) += r(s) / outdeg(s)
      r = nodes.map(v => v -> (base + (85L * inc(v)) / 100L)).toMap
    }
    r
  }

  private def run(edges: Seq[(Long, Long)], iters: Int = 5): Map[Long, Long] =
    Graph.pageRank(edges.toDF("src", "dst"), "src", "dst", iters)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap

  test("pageRank matches the single-threaded integer reference exactly") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(400)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    assert(run(edges) == refPageRank(edges, 5))
  }

  test("a hub everyone links to outranks its spokes; symmetric cycle ties") {
    val star = (1L to 9L).map(i => (i, 0L))
    val ranks = run(star)
    assert(ranks(0L) > ranks(1L))
    assert((1L to 9L).map(ranks).toSet.size == 1) // spokes identical
    val cycle = Seq((1L, 2L), (2L, 1L))
    val c = run(cycle)
    assert(c(1L) == c(2L))
  }

  test("multi-edges weight the surfer: a doubled link draws more rank") {
    // 1 links twice to 2 and once to 3
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (2L, 1L), (3L, 1L))
    val ranks = run(edges)
    assert(ranks(2L) > ranks(3L))
    assert(ranks == refPageRank(edges, 5))
  }

  test("mass is conserved up to leakage: base·N <= sum(rank) <= RankScale, on random graphs") {
    val rnd = new scala.util.Random(31)
    for (seed <- 1 to 3) {
      val n = 10 + seed * 13
      val edges = Seq.fill(n * 8)((rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val ranks = run(edges)
      val nodes = ranks.size.toLong
      val base = (Graph.RankScale / nodes * 15L) / 100L
      val total = ranks.values.sum
      // every node holds at least the teleport floor; truncating
      // divisions and dangling nodes only ever LOSE mass
      assert(ranks.values.forall(_ >= base))
      assert(total <= Graph.RankScale && total >= base * nodes)
    }
  }

  private def refPpr(edges: Seq[(Long, Long)], seeds: Set[Long], iters: Int): Map[Long, Long] = {
    val nodes = ((edges.map(_._1) ++ edges.map(_._2)) ++ seeds).distinct
    val init = Graph.RankScale / seeds.size
    val base = (init * 15L) / 100L
    val outdeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    var r = nodes.map(v => v -> (if (seeds(v)) init else 0L)).toMap
    for (_ <- 1 to iters) {
      val inc = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) inc(d) += r(s) / outdeg(s)
      r = nodes.map(v => v -> ((if (seeds(v)) base else 0L) + (85L * inc(v)) / 100L)).toMap
    }
    r.filter(_._2 > 0)
  }

  test("personalizedPageRank matches the reference; unreached nodes drop; seeds dominate nearby") {
    val rnd = new scala.util.Random(17)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong)) ++
      Seq((100L, 101L), (101L, 100L)) // an island unreachable from the seeds
    val seeds = Set(0L, 1L, 2L)
    val got = Graph.personalizedPageRank(
      edges.toDF("src", "dst"), "src", "dst",
      seeds.toSeq.toDF("node"), iters = 5)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(got == refPpr(edges, seeds, 5))
    assert(!got.contains(100L) && !got.contains(101L)) // island never reached
    assert(seeds.forall(s => got.getOrElse(s, 0L) > 0L))
  }

  test("rank_fp is partitioning-independent (all-integer arithmetic)") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    val df = edges.toDF("src", "dst")
    val a = Graph.pageRank(df, "src", "dst", 5)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    val b = Graph.pageRank(df.repartition(13), "src", "dst", 5)
      .select("node", "rank_fp").as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("triangleCount: known shapes — triangle, star, K4, self-loops and multi-edges ignored") {
    def tri(edges: Seq[(Long, Long)]): (Long, Long, Long, Long) =
      Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long, Long, Long)].collect().head
    // one triangle, listed with duplicates / reversals / a self-loop
    assert(tri(Seq((1L, 2L), (2L, 3L), (3L, 1L), (2L, 1L), (1L, 1L))) == ((3L, 3L, 1L, 2L)))
    // a 4-star has no triangles, hub degree 4
    assert(tri(Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))) == ((5L, 4L, 0L, 4L)))
    // K4: C(4,3) = 4 triangles, 6 edges, degree 3
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(tri(k4) == ((4L, 6L, 4L, 3L)))
    // two triangles sharing an edge: 5 edges, 2 triangles
    assert(tri(Seq((1L, 2L), (2L, 3L), (1L, 3L), (2L, 4L), (3L, 4L))) == ((4L, 5L, 2L, 3L)))
  }

  test("triangleCount matches a brute-force count on a random graph and ignores direction") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(200)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    val undirected = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = undirected.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val nodes = undirected.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    // yield the triple, not a constant: Set comprehensions dedupe values
    val brute = (for {
      a <- nodes
      b <- adj.getOrElse(a, Set.empty[Long]).toSeq
      c <- adj.getOrElse(a, Set.empty[Long]).toSeq
      if b < c && adj.getOrElse(b, Set.empty[Long]).contains(c)
    } yield (a, b, c)).size
    val got = Graph.triangleCount(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long, Long, Long)].collect().head
    assert(got._3 == brute.toLong, s"triangles ${got._3} vs brute $brute")
    assert(got._2 == undirected.size.toLong)
  }

  /** Single-threaded BFS mirror: first-reached round per node. */
  private def refBfs(edges: Seq[(Long, Long)], seeds: Set[Long], maxDepth: Int): Map[Long, Int] = {
    val adj = edges.distinct.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    var dist = seeds.map(_ -> 0).toMap
    var frontier = seeds
    var d = 1
    while (d <= maxDepth && frontier.nonEmpty) {
      val next = frontier.flatMap(n => adj.getOrElse(n, Set.empty[Long])) -- dist.keySet
      dist = dist ++ next.map(_ -> d)
      frontier = next
      d += 1
    }
    dist
  }

  private def runBfs(edges: Seq[(Long, Long)], seeds: Seq[Long], maxDepth: Int = 4): Map[Long, Int] =
    Graph.bfsLayers(edges.toDF("src", "dst"), "src", "dst",
      seeds.toDF("node"), maxDepth = maxDepth)
      .as[(Long, Int)].collect().toMap

  test("bfsLayers matches the single-threaded reference on a random sparse digraph") {
    val rnd = new scala.util.Random(13)
    val edges = Seq.fill(120)((rnd.nextInt(60).toLong, rnd.nextInt(60).toLong))
    assert(runBfs(edges, Seq(0L, 1L)) == refBfs(edges, Set(0L, 1L), 4))
  }

  test("bfsLayers: chain graph yields one node per layer, stops at maxDepth, direction respected") {
    val chain = (0L until 8L).map(i => (i, i + 1))
    val got = runBfs(chain, Seq(0L), maxDepth = 3)
    assert(got == Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
    // arcs point forward only: seeding the far end reaches nothing new
    val rev = runBfs(chain, Seq(8L), maxDepth = 3)
    assert(rev == Map(8L -> 0))
  }

  test("bfsLayers early-stops on a dry frontier and dedups multi-arcs") {
    val edges = Seq((1L, 2L), (1L, 2L), (2L, 3L))
    val got = runBfs(edges, Seq(1L), maxDepth = 10)
    assert(got == Map(1L -> 0, 2L -> 1, 3L -> 2))
  }

  /** Single-threaded synchronous LPA mirror: neighbor mode, ties to the
    * lowest label, all nodes updated from the previous round's snapshot.
    */
  private def refLpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
    val sym = (und ++ und.map(e => (e._2, e._1))).distinct
    val adj = sym.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var lab: Map[Long, Long] = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      val prev = lab
      lab = adj.map { case (n, nbrs) =>
        val counts = nbrs.groupBy(prev).view.mapValues(_.size).toSeq
        n -> counts.map { case (l, c) => (-c, l) }.min._2
      }
    }
    lab
  }

  private def runLpa(edges: Seq[(Long, Long)], iters: Int = 4): Map[Long, Long] =
    Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", iters)
      .select("node", "label").as[(Long, Long)].collect().toMap

  test("labelPropagation matches the single-threaded reference on a random graph") {
    val rnd = new scala.util.Random(29)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(runLpa(edges) == refLpa(edges, 4))
  }

  test("labelPropagation separates two cliques joined by one bridge") {
    def clique(ns: Seq[Long]) = for (a <- ns; b <- ns if a < b) yield (a, b)
    val edges = clique(Seq(0L, 1L, 2L, 3L)) ++ clique(Seq(10L, 11L, 12L, 13L)) ++ Seq((3L, 10L))
    val out = Graph.labelPropagation(edges.toDF("src", "dst"), "src", "dst", 4)
      .as[(Long, Long, Long)].collect().toSeq
    val byLabel = out.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    // the two cliques resolve to separate communities
    assert(byLabel.values.exists(_ == Set(0L, 1L, 2L, 3L)) ||
      byLabel.values.exists(s => Set(0L, 1L, 2L).subsetOf(s) && !s.contains(11L)))
    assert(out.forall { case (n, l, sz) =>
      sz == out.count(_._2 == l)
    })
  }

  /** Single-threaded mirror of the integer HITS recurrence: same grid,
    * same renormalizing divisions. Exact-equality oracle. */
  private def refHits(edges: Seq[(Long, Long)], iters: Int): Map[Long, (Long, Long)] = {
    val nodes = (edges.map(_._1) ++ edges.map(_._2)).distinct
    var h = nodes.map(_ -> Graph.HitsScale).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to iters) {
      val araw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) araw(d) += h(s)
      val at = araw.values.sum
      a = nodes.map(v => v -> (araw(v) * Graph.HitsScale) / at).toMap
      val hraw = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      for ((s, d) <- edges) hraw(s) += a(d)
      val ht = hraw.values.sum
      h = nodes.map(v => v -> (hraw(v) * Graph.HitsScale) / ht).toMap
    }
    nodes.map(v => v -> ((a(v), h(v)))).toMap
  }

  private def runHits(edges: Seq[(Long, Long)], iters: Int = 3): Map[Long, (Long, Long)] =
    Graph.hits(edges.toDF("src", "dst"), "src", "dst", iters)
      .select("node", "auth_fp", "hub_fp").as[(Long, Long, Long)].collect()
      .map { case (n, a, h) => n -> ((a, h)) }.toMap

  test("hits matches the single-threaded integer reference exactly") {
    val rnd = new scala.util.Random(11)
    val edges = Seq.fill(300)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
    assert(runHits(edges) == refHits(edges, 3))
  }

  test("hits: spokes pointing at a center make it the authority and them the hubs") {
    val star = (1L to 6L).map(i => (i, 0L))
    val out = runHits(star)
    // center holds ALL authority mass, zero hub mass; spokes the reverse
    assert(out(0L)._1 > out(1L)._1)
    assert(out(1L)._2 > out(0L)._2)
    assert((1L to 6L).map(out(_)._2).toSet.size == 1) // identical hubs
  }

  test("hits: a doubled link concentrates authority on its target") {
    val edges = Seq((1L, 2L), (1L, 2L), (1L, 3L), (4L, 2L), (4L, 3L))
    val out = runHits(edges)
    assert(out(2L)._1 > out(3L)._1)
    assert(out == refHits(edges, 3))
  }

  test("reciprocity: mutual pairs count, one-way links don't, dups and self-loops ignored") {
    val edges = Seq(
      (1L, 2L), (2L, 1L),           // mutual pair
      (1L, 3L),                     // one-way
      (1L, 3L),                     // duplicate (collapses)
      (3L, 3L),                     // self-loop (dropped)
      (4L, 1L))                     // one-way into 1
    val m = Graph.reciprocity(edges.toDF("src", "dst"), "src", "dst")
      .select("node", "out_edges", "reciprocated", "recip_fp")
      .as[(Long, Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(m(1L) == ((2L, 1L, 524288L))) // out {2,3}, reciprocated {2}: ratio 1/2
    assert(m(2L) == ((1L, 1L, 1048576L)))
    assert(m(4L) == ((1L, 0L, 0L)))
    assert(!m.contains(3L)) // only the self-loop out-edge: dropped entirely
  }

  /** Single-threaded mirror of the HyperBall register recurrence: md5
    * coin, sparse register maps, elementwise-max neighbor merge. */
  private def refHyperBall(edges: Seq[(Long, Long)],
                           rounds: Int): Map[(Long, Int), (Long, Long)] = {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
    val dedup = edges.filter(e => e._1 != e._2).distinct
    val nodes = (dedup.map(_._1) ++ dedup.map(_._2)).distinct
    val inEdges = dedup.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    def seed(n: Long): Map[Long, Long] = {
      val c = java.lang.Long.parseLong(md5hex(s"hb:$n").substring(0, 14), 16)
      val j = c >>> 48
      val w = c & ((1L << 48) - 1)
      val mr = if (w == 0) 49L else 49L - java.lang.Long.toBinaryString(w).length
      Map(j -> mr)
    }
    def mergeMax(a: Map[Long, Long], b: Map[Long, Long]): Map[Long, Long] =
      (a.keySet ++ b.keySet).map(j =>
        j -> math.max(a.getOrElse(j, 0L), b.getOrElse(j, 0L))).toMap
    var regs = nodes.map(n => n -> seed(n)).toMap
    def summarize(r: Int): Map[(Long, Int), (Long, Long)] =
      regs.map { case (n, m) =>
        val vz = 256L - m.size
        val ss = m.values.map(mr => 1L << (49 - mr)).sum + vz * (1L << 49)
        (n, r) -> ((vz, ss))
      }
    var out = summarize(0)
    for (r <- 1 to rounds) {
      regs = nodes.map { n =>
        n -> inEdges.getOrElse(n, Seq.empty).map(regs).foldLeft(regs(n))(mergeMax)
      }.toMap
      out = out ++ summarize(r)
    }
    out
  }

  test("hyperBall register summaries match the single-threaded mirror on a random digraph") {
    val rnd = new scala.util.Random(19)
    val edges = Seq.fill(200)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
    val got = Graph.hyperBall(edges.toDF("src", "dst"), "src", "dst", rounds = 3)
      .select("node", "r", "v_zero", "s_scaled")
      .as[(Long, Int, Long, Long)].collect()
      .map(t => (t._1, t._2) -> ((t._3, t._4))).toMap
    assert(got == refHyperBall(edges, 3))
  }

  test("hyperBall on a chain: the ball grows one hop per round, registers only accumulate") {
    // 1 -> 2 -> 3 -> 4: node 4's in-ball gains one node per round
    val chain = Seq((1L, 2L), (2L, 3L), (3L, 4L))
    val out = Graph.hyperBall(chain.toDF("src", "dst"), "src", "dst", rounds = 3)
      .select("node", "r", "v_zero").as[(Long, Int, Long)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    // v_zero = 256 - (#distinct registers) and the ball of node 4 grows
    // by <= 1 register per round, never shrinking
    assert(out((4L, 0)) >= out((4L, 1)))
    assert(out((4L, 1)) >= out((4L, 2)))
    assert(out((4L, 2)) >= out((4L, 3)))
    // node 1 has no in-edges: its sketch never changes
    assert(Seq(0, 1, 2, 3).map(r => out((1L, r))).distinct.size == 1)
    assert(out == refHyperBall(chain, 3).map { case (k, v) => k -> v._1 })
  }

  test("reciprocity matches a brute-force count on a random digraph") {
    val rnd = new scala.util.Random(41)
    val edges = Seq.fill(250)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
    val distinct = edges.filter(e => e._1 != e._2).distinct
    val eset = distinct.toSet
    val expected = distinct.groupBy(_._1).map { case (n, es) =>
      n -> ((es.size.toLong, es.count(e => eset.contains((e._2, e._1))).toLong))
    }
    val got = Graph.reciprocity(edges.toDF("src", "dst"), "src", "dst")
      .select("node", "out_edges", "reciprocated")
      .as[(Long, Long, Long)].collect().map(t => t._1 -> ((t._2, t._3))).toMap
    assert(got == expected)
  }

  test("assortativity: hand-computed Pearson over degree-annotated edges") {
    // edges 1->2, 1->3, 2->3: x (src outdeg) = [2,2,1], y (dst indeg) = [1,2,2]
    val got = Graph.assortativity(
      Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Option[Double])].collect().head
    // same fixed-order float ops as the operator (sqrt(2)^2 != 2 in IEEE)
    val want = (3L * 8 - 5 * 5).toDouble /
      (math.sqrt((3L * 9 - 25).toDouble) * math.sqrt((3L * 9 - 25).toDouble))
    assert(got._1 == 3L && got._2.contains(want))
  }

  test("assortativity is null on a degenerate (constant-degree) graph") {
    val got = Graph.assortativity(
      Seq((1L, 2L), (3L, 4L)).toDF("src", "dst"), "src", "dst")
      .as[(Long, Option[Double])].collect().head
    assert(got._1 == 2L && got._2.isEmpty)
  }

  test("trussPeel: K4 survives k=4, low-support appendage peels; cascade empties") {
    // K4 on 1..4 (every edge in 2 triangles) + a triangle 4-5-6 whose
    // edges sit in only 1 triangle: k=4 keeps exactly the K4
    val k4 = for { a <- 1L to 4L; b <- (a + 1) to 4L } yield (a, b)
    val extra = Seq((4L, 5L), (4L, 6L), (5L, 6L))
    val edges = (k4 ++ extra).toDF("src", "dst")
    val got = Graph.trussPeel(edges, "src", "dst", k = 4, rounds = 3)
      .as[(Long, Long, Int)].collect().toSeq
    assert(got == k4.map { case (a, b) => (a, b, 2) })
    // cascade: removing support-1 edges strands the middle edge, which
    // must fall in the NEXT round (peeling, not one-shot filtering)
    val chain = Seq((1L, 2L), (1L, 3L), (2L, 3L), (2L, 4L), (3L, 4L))
      .toDF("src", "dst")
    val gone = Graph.trussPeel(chain, "src", "dst", k = 4, rounds = 2)
      .as[(Long, Long, Int)].collect().toSeq
    assert(gone.isEmpty, gone.toString)
  }
}
