package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators._
import graft.sources.Tables

/** Local scale-up smoke: times the heavy operator pipelines at 1× and
  * 10× the sf0.1 corpus and prints the scaling ratio per operator — the
  * empirical check behind SCALING.md's "survives a scale-up" claims
  * (a near-linear ratio says the plan's shuffle/skew budget holds; a
  * superlinear one says some stage is quadratic or collapsing onto few
  * tasks).
  *
  * The 10× corpus is 10 token-renamed copies (token → token_k for copy
  * k>0): document COUNT and vocabulary scale 10×, per-doc structure is
  * preserved, and no artificial cross-copy near-dups are planted — the
  * fair shape for measuring throughput scaling. Events replicate with
  * shifted ids/users (more keys, not hotter keys).
  *
  * Run: `sbt "runMain graft.ScaleSmoke"` (expect a few minutes; never
  * concurrently with a bench). `SPARK_GRAFT_SCALE_COPIES` overrides the
  * 10× default; `SPARK_GRAFT_SCALE_OPS=a,b` restricts to named
  * operators (the heavier dedup pipelines at 100× take minutes).
  */
object ScaleSmoke {

  private def time[A](f: => A): Double = {
    val t0 = System.nanoTime()
    f
    (System.nanoTime() - t0) / 1e9
  }

  private def docsAt(base: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { k =>
      if (k == 0) base
      else base.select(
        (col("doc_id") + k * 1000000L).as("doc_id"),
        concat_ws(" ", transform(split(col("text"), "\\s+"), t => concat(t, lit(s"_$k")))).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }.reduce(_ unionByName _)

  private def eventsAt(base: DataFrame, copies: Int): DataFrame =
    (0 until copies).map { k =>
      base.select(
        (col("event_id") + k * 100000000L).as("event_id"),
        col("ts"),
        (col("user_id") + k * 1000000L).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)

  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val copies = sys.env.get("SPARK_GRAFT_SCALE_COPIES").map(_.toInt).getOrElse(10)
    val only = sys.env.get("SPARK_GRAFT_SCALE_OPS").map(_.split(",").map(_.trim).toSet)
    val nPart = spark.sparkContext.defaultParallelism
    // materialize both corpora once so generation cost never pollutes an
    // operator's timing, and both scales see the same partition grain
    val docs1 = docsAt(Tables.documents(spark, d), 1).repartition(nPart).localCheckpoint(true)
    val docs10 = docsAt(Tables.documents(spark, d), copies).repartition(nPart).localCheckpoint(true)
    val ev1 = eventsAt(Tables.events(spark, d), 1).repartition(nPart).localCheckpoint(true)
    val ev10 = eventsAt(Tables.events(spark, d), copies).repartition(nPart).localCheckpoint(true)
    println(s"[scale] ${copies}x: docs ${docs1.count()} -> ${docs10.count()}, events ${ev1.count()} -> ${ev10.count()}")

    def itemEdges(ev: DataFrame): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      ev.select(col("user_id"), col("ts"), col("event_id"),
          get_json_object(col("props"), "$.k").cast("long").as("k"))
        .select(lag(col("k"), 1).over(w).as("src"), col("k").as("dst"))
        .where(col("src").isNotNull && col("dst").isNotNull)
    }

    def queries(docs: DataFrame, ev: DataFrame): Seq[(String, () => Long)] = Seq(
      "exact_groups" -> (() => Dedup.exactGroups(docs, "text", "doc_id").count()),
      "minhash_clusters" -> (() => Dedup.minHashClusters(docs, "text", "doc_id").count()),
      "simhash_clusters" -> (() => Dedup.simHashClusters(docs, "text", "doc_id").count()),
      "boilerplate" -> (() => TextAnalysis.boilerplateMetrics(docs, "text", "doc_id").count()),
      "unigram_nll" -> (() => TextAnalysis.unigramNll(docs, "text", "doc_id", topK = 24).count()),
      "bm25" -> (() => {
        val q = docs.limit(20).select(col("doc_id").as("query_id"), col("text"))
        Retrieval.bm25TopK(docs, q, k = 10).count()
      }),
      "tfidf_keywords" -> (() => Retrieval.tfidfTopTerms(docs, k = 5).count()),
      "sessionize" -> (() => Sessionize
        .assign(ev, Seq("user_id"), "ts", 1800, Seq("event_id"))
        .groupBy("user_id", "session_seq").count().count()),
      "asof" -> (() => {
        val p = ev.where(col("event_type") === "purchase").select(col("user_id"), col("event_id"), col("ts"))
        val c = ev.where(col("event_type") === "click").select(col("user_id"), col("ts"), col("event_id"), col("value"))
        AsOfJoin.asOf(p, c, Seq("user_id"), "ts", "ts", Seq("event_id")).count()
      }),
      // round 8c
      "span_profile" -> (() => Dedup.spanProfile(docs, "text", "doc_id", k = 6).count()),
      "classifier" -> (() => QualityClassifier.scoreHashModel(docs, "text", "doc_id").count()),
      "bigram_nll" -> (() => TextAnalysis.bigramNllBackoff(docs, "text", "doc_id", topK = 512).count()),
      "funnel" -> (() => Funnel.steps(ev, "user_id", "ts",
        Seq(col("event_type") === "view", col("event_type") === "click",
          col("event_type") === "purchase"), 86400L).count()),
      "scd2_compact" -> (() => Sessionize.compactRuns(ev, Seq("user_id"), "ts",
        "event_type", Seq("event_id")).count()),
      // round 11: the large-probe decontamination path — corpus AND probe
      // scale together here (an upper bound; real eval sets are fixed-size)
      "bloom_decontam" -> (() => Dedup.ngramContaminationBloom(
        docs.where(pmod(col("doc_id"), lit(10)) =!= 7),
        docs.where(pmod(col("doc_id"), lit(10)) === 7),
        "text", "doc_id", n = 13).count()),
      // round 11b: drift is token-volume-bound (one shuffle builds both
      // distributions); rrf's legs are corpus-bound, the fusion itself
      // retrieval-result-bound (fixed query count at every scale)
      "drift" -> (() => TextAnalysis.tokenDrift(
        docs.where(pmod(col("doc_id"), lit(2)) === 0),
        docs.where(pmod(col("doc_id"), lit(2)) === 1),
        "text", "lang").count()),
      "rrf" -> (() => {
        val q = docs.limit(20).select(col("doc_id").as("query_id"), col("text"))
        val sparse = Retrieval.bm25TopK(docs, q, k = 20)
          .select(col("query_id"), col("doc_id"), col("rank"))
        val dense = Similarity.hashEmbedTopK(docs, q.withColumnRenamed("query_id", "doc_id"), k = 20)
          .select(col("query_id"), col("neighbor_id").as("doc_id"), col("rank"))
        Retrieval.rrfFuse(Seq(sparse, dense), k = 10).count()
      }),
      // round 11c: both sketch paths must scale as ONE corpus-bound
      // aggregate each — KMV state is 64 longs per group regardless of
      // cardinality; the histogram shuffles #strata x #bins rows only
      "kmv_distinct" -> (() => {
        graft.plans.GraftExtensions.register(docs.sparkSession)
        docs
          .select(col("lang"), explode(Dedup.shingles(col("text"), 3)).as("sh"))
          .select(col("lang"),
            conv(substring(md5(col("sh")), 1, 6), 16, 10).cast("long").as("coin"))
          .groupBy(col("lang"))
          .agg(call_function("kmv_min_k", col("coin"), lit(64)).as("mink"))
          .count()
      }),
      "hist_quantiles" -> (() => graft.operators.Expectations
        .histogramQuantiles(docs, "lang", col("n_chars"), 16L, Seq(5000, 9900)).count()),
      "rate_anomaly" -> (() => graft.operators.RateAnomaly
        .detect(ev.withColumn("ts", col("ts").cast("timestamp")), "event_type", "ts").count()),
      // round 11e: pagerank's node set is the fixed item-id space, so a
      // 10x event load means denser edges per node (the web-graph
      // shape); winnow/dsir are corpus-bound map work + bucketed joins;
      // rerank's second stage is candidate-bound (fixed query count) —
      // only its bm25 leg should scale with the corpus
      "pagerank" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .select(lag(col("k"), 1).over(w).as("src"), col("k").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
        Graph.pageRank(edges, "src", "dst", 5).count()
      }),
      "winnow_pairs" -> (() => Winnow.pairs(docs, "text", "doc_id").count()),
      "dsir" -> (() => CorpusSelection.selectByDsir(
        docs, docs.where(col("source") === "src0"), "text", "doc_id", 100).count()),
      "rerank" -> (() => {
        val q = docs.limit(20).select(col("doc_id").as("query_id"), col("text"))
        Retrieval.rerankJaccard(docs, q, kCandidates = 20, k = 10).count()
      }),
      // round 11e (late): ppr = the pagerank loop + a seed flag; the
      // overlap sketch must stay sketch-sized after its one distinct +
      // window; rag chain = bounded explode + map-local simhash + one
      // bucket aggregate
      "ppr" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val kcol = get_json_object(col("props"), "$.k").cast("long")
        val base = ev.select(col("user_id"), col("ts"), col("event_id"), kcol.as("k"))
        val edges = base
          .select(lag(col("k"), 1).over(w).as("src"), col("k").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
        val seeds = base.where(col("k").isNotNull && col("k") < 10)
          .select(col("k").as("node")).distinct()
        Graph.personalizedPageRank(edges, "src", "dst", seeds, iters = 5).count()
      }),
      "overlap_sketch" -> (() => Dedup.sourceOverlapSketch(docs, "text", "source", k = 16).count()),
      "rag_chain" -> (() => {
        val chunks = TextAnalysis.chunkTokens(docs, "text", "doc_id", 32, 8)
          .select((col("doc_id") * 4096 + col("chunk_idx")).as("chunk_key"), col("chunk_text"))
        Dedup.simHash(chunks, "chunk_text", "chunk_key")
          .select(col("chunk_key"), org.apache.spark.sql.functions.shiftright(col("simhash"), 32).as("bucket"))
          .groupBy(col("bucket")).agg(count(lit(1)).as("n")).count()
      }),
      // round 11f: CDC is token-bound map work + a per-doc window + the
      // fingerprint share join; stitch is two slim projections + one
      // boundary equi-join; triangles must hold the O(|E|^1.5) wedge
      // budget as edges densify over the fixed node space (the pagerank
      // shape — the 10x load is DENSER, the adversarial direction)
      "cdc_chunks" -> (() => TextAnalysis.cdcChunks(docs, "text", "doc_id").count()),
      "perceptron" -> (() => QualityClassifier.trainPerceptron(
        docs.withColumn("y",
          when(size(split(lower(trim(col("text"))), "\\s+")) >= 45, 1L).otherwise(-1L)),
        "text", "doc_id", "y", iters = 5).count()),
      "kmeans" -> (() => {
        // hash-derived 16-dim vectors so the vector count scales with the
        // docs corpus (the embeddings table has no scaled copies)
        val embs = docs.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), i =>
            ((pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), i.cast("string"))), 1, 6), 16, 10).cast("long"),
              lit(1000L)) - lit(500L)).cast("double") / 500.0).cast("float"))
            .as("embedding"))
        Similarity.lloydKMeans(embs, "embedding", "vec_id", k = 8, iters = 3).count()
      }),
      // round 14: graph-ANN — the build's candidate volume is bounded
      // per node (LSH bucket width + hash-group width + (2·degree)² per
      // descent round), so build cost must scale with N, never N²;
      // search is query-bound (fixed 10 queries at every scale)
      "ann_graph" -> (() => {
        val embs = docs.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), i =>
            ((pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), i.cast("string"))), 1, 6), 16, 10).cast("long"),
              lit(1000L)) - lit(500L)).cast("double") / 500.0).cast("float"))
            .as("embedding"))
        val g = AnnGraph.buildGraph(embs, dim = 16, degree = 8)
        AnnGraph.beamSearch(g, embs, embs.where(col("vec_id") < 10),
          k = 10, beam = 16, dim = 16).count()
      }),
      // pack: the fold is O(docs_in_shard x bins) PER SHARD — the shard
      // key is the user's parallelism AND state bound, so the smoke
      // shards by (lang, id-kilobucket) to hold shard size constant as
      // the corpus grows (the production shape; 5 fixed mega-shards
      // would be the quadratic mistake)
      "pack_bestfit" -> (() => CorpusSelection.packBestFit(
        docs.withColumn("_shard",
          concat_ws(":", col("lang"), expr("doc_id div 1000"))),
        "doc_id", size(split(lower(trim(col("text"))), "\\s+")), 256L,
        "_shard").count()),
      // prefix cache: per-shard sort windows (langs are fixed, so the
      // 10x corpus means 10x-deeper shard sorts — the n log n budget);
      // scaling curve: ONE corpus token pass, everything after on the
      // vocabulary table
      "prefix_cache" -> (() => TextAnalysis.prefixCacheProfile(
        docs, "text", "doc_id", "lang").count()),
      "scaling_curve" -> (() => TextAnalysis.scalingCurve(
        docs, "text", "doc_id").count()),
      "stitch" -> (() => Dedup.stitchPairs(docs, "text", "doc_id").count()),
      "triangles" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val edges = ev
          .select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .select(lag(col("k"), 1).over(w).as("src"), col("k").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull)
        Graph.triangleCount(edges, "src", "dst").count()
      }),
      // round 11h: the graph fixpoints see 10x EDGE volume over the same
      // 100-item node set (denser, not bigger — the items alphabet is
      // fixed in props); collocations and the HLL aggregate are
      // token/event-volume-bound with vocabulary-sized outputs
      "bfs" -> (() => {
        val edges = itemEdges(ev)
          .where(pmod(col("src") * 31 + col("dst"), lit(7)) === 0)
        // seeds from the raw projection (no window), the graphBfs shape —
        // deriving them from `edges` would run the lag window twice
        val seeds = ev.select(get_json_object(col("props"), "$.k").cast("long").as("node"))
          .where(col("node").isNotNull && col("node") < 3).distinct()
        Graph.bfsLayers(edges, "src", "dst", seeds, maxDepth = 4).count()
      }),
      "lpa" -> (() => {
        val edges = itemEdges(ev)
          .where(pmod(col("src") * 31 + col("dst"), lit(7)) === 0)
        Graph.labelPropagation(edges, "src", "dst", iters = 4).count()
      }),
      "collocations" -> (() =>
        TextAnalysis.collocations(docs, "text", minCount = 5, topK = 20).count()),
      "hll" -> (() => {
        graft.plans.GraftExtensions.register(spark)
        ev.select(col("event_type"),
          conv(substring(md5(concat(lit("hll:"), col("user_id"))), 1, 14), 16, 10)
            .cast("long").as("coin"))
          .groupBy(col("event_type"))
          .agg(call_function("hll_registers", col("coin"), lit(8)).as("regs"))
          .count()
      }),
      "covisit" -> (() => SequenceMining.covisitTopK(
        ev.withColumn("k", get_json_object(col("props"), "$.k").cast("long")),
        "user_id", "ts", "event_id", "k", k = 3).count()),
      "kcore" -> (() => {
        // the graph_kcore sparsification (mod 47) so the peel cascades
        val edges = itemEdges(ev)
          .where(pmod(col("src") * 31 + col("dst"), lit(47)) === 0)
        Graph.kCore(edges, "src", "dst", k = 2, maxRounds = 10).count()
      }),
      // round 11k: jaccard_join's candidate volume is Σ(prefix-token
      // df²) — rare-first ordering keeps it near-linear as the corpus
      // (and its vocabulary) grows 10×; hyperball is rounds × |E| ×
      // non-zero registers over the fixed item alphabet (denser edges,
      // the pagerank direction); kcenter is k corpus passes over a slim
      // (id, qv, d2) table; attribution is one window+aggregate pass —
      // the driver solve is vocabulary-bounded and scale-invariant
      "jaccard_join" -> (() =>
        Dedup.prefixJaccardPairs(docs, "text", "doc_id", 1, 2, shingleK = 3).count()),
      "hyperball" -> (() =>
        Graph.hyperBall(itemEdges(ev), "src", "dst", rounds = 3).count()),
      "kcenter" -> (() => {
        val embs = docs.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), i =>
            ((pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit(":"), i.cast("string"))), 1, 6), 16, 10).cast("long"),
              lit(1000L)) - lit(500L)).cast("double") / 500.0).cast("float"))
            .as("embedding"))
        CorpusSelection.kCenterSelect(embs, "embedding", "vec_id", k = 6).count()
      }),
      "attribution" -> (() => Attribution.removalEffects(
        ev.withColumn("ts", col("ts").cast("timestamp")),
        "user_id", "event_type", "ts", "event_id", "purchase").count()),
      // round-11 closing: the wedge join's fan-out must stay degree-
      // bounded (a superlinear ratio = the cap failed); phash payloads
      // reduce map-side, so the band join sees only (id, hash) rows;
      // modularity rides the LPA fit + two slim label joins
      "adamic_adar" -> (() => Graph.adamicAdar(
        itemEdges(ev), "src", "dst", degCap = 64L, topK = 50).count()),
      "phash_pairs" -> (() => Multimodal.perceptualHashPairs(
        Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload",
        maxHamming = 6).count()),
      "modularity" -> (() => {
        val e = itemEdges(ev).where(pmod(col("src") * 31 + col("dst"), lit(7)) === 0)
        Graph.modularity(e, "src", "dst",
          Graph.labelPropagation(e, "src", "dst", iters = 4)).count()
      }),
      // round 12: the clip gate is shuffle-free, so its ratio is the
      // purest scan-bound signal in the table; theil-sen/decay/cuped
      // are one corpus exchange + calendar/user-bounded tails; qnorm is
      // one group window over a slim (group, id, score) projection
      "clip_gate" -> (() => Multimodal.clipScoreGate(
        Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload",
        "text").count()),
      "theil_sen" -> (() =>
        RateAnomaly.theilSen(ev, "event_type", "ts").count()),
      "decay_trend" -> (() =>
        RateAnomaly.decayTrend(ev, "event_type", "ts").count()),
      "cuped" -> (() => RateAnomaly.cuped(ev, "user_id", "ts", "value",
        pmod(col("user_id"), lit(2L))).count()),
      "qnorm" -> (() => CorpusSelection.quantileNormalize(
        docs, "source", "doc_id", col("n_chars")).count()),
      // round-12 closing: pca's pair aggregate is the only corpus
      // exchange; the gap sweep shares sessionize's one window; the
      // seasonal monitor is one triple count + a broadcast profile
      "gap_sweep" -> (() => Sessionize.gapSweep(ev, Seq("user_id"), "ts",
        gapsMinutes = Seq(5, 30, 60), tieCols = Seq("event_id")).count()),
      "seasonal_adj" -> (() =>
        RateAnomaly.detectSeasonal(ev, "event_type", "ts").count()),
      "audio_vad" -> (() => Multimodal.vadSegments(
        Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload",
        sampleRate = 8000, windowMs = 4, hopMs = 2,
        thresholdPerSample = 27500L).count()),
      "pca_embed" -> (() => {
        val embs = docs.select(col("doc_id").as("vec_id"),
          transform(sequence(lit(0), lit(15)), i =>
            ((pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
              lit("#"), i.cast("string"))), 1, 6), 16, 10).cast("long"),
              lit(1000L)) - lit(500L)).cast("double") / 500.0).cast("float"))
            .as("embedding"))
        Similarity.topPrincipalComponent(embs, "vec_id", "embedding", dim = 16).count()
      }),
      // round 13: the unigram trainer is corpus-bound only in the word
      // count — the 10x corpus ALSO 10x-es the distinct-word table here
      // (token-renamed copies), so this ratio upper-bounds the real
      // fixed-language case where vocabulary saturates; the perceptron
      // loop's per-epoch cost is corpus-proportional map work + a
      // bucket-domain exchange
      "spm_train" -> (() => UnigramLm.train(docs, "text").count()),
      // planted shared runs (stitched docs) so the anchor join and
      // extension stages carry real work at every scale — pairs grow
      // linearly with the corpus
      "substring_runs" -> (() => {
        val base = docs.select(col("doc_id"),
          split(lower(trim(col("text"))), "\\s+").as("toks"))
        val st = base.as("d").join(base.as("p"),
            col("p.doc_id") === col("d.doc_id") + 1)
          .where(pmod(col("d.doc_id"), lit(10)) === 0)
          .select((col("d.doc_id") + 10000000L).as("doc_id"),
            concat(slice(col("d.toks"), 1, 12),
              slice(col("p.toks"), lit(3), lit(24)),
              slice(col("d.toks"), 13, 8)).as("toks"))
        SuffixRuns.sharedRunsTok(
          base.unionByName(st).select(col("doc_id").as("_id"), col("toks")),
          minRun = 8, levels = 4).count()
      }),
      "classifier_train" -> (() => QualityClassifier.trainPerceptron(
        docs.withColumn("y",
          when(size(split(lower(trim(col("text"))), "\\s+")) >= 45, 1L)
            .otherwise(-1L)),
        "text", "doc_id", "y", buckets = 4096, iters = 5).count()),
      // the truss wedge join is the per-round cost; the 10x events
      // grow edges and wedge volume together
      "ktruss" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val e = ev.select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .select(lag(col("k"), 1).over(w).as("src"), col("k").as("dst"))
          .where(col("src").isNotNull && col("dst").isNotNull &&
            col("src") =!= col("dst"))
          .where(conv(substring(md5(concat(lit("tr:"),
            least(col("src"), col("dst")).cast("string"), lit(":"),
            greatest(col("src"), col("dst")).cast("string"))), 1, 6), 16, 10)
            .cast("long") % 5 === 0)
        Graph.trussPeel(e, "src", "dst", k = 5, rounds = 6).count()
      }),
      // matches grow linearly with events; the items domain grows with
      // the shifted-key 10x copies, so pair and per-round costs scale
      "bradley_terry" -> (() => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val m = ev.select(col("user_id"), col("ts"), col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k"))
          .select(lag(col("k"), 1).over(w).as("loser"), col("k").as("winner"))
          .where(col("loser").isNotNull && col("winner").isNotNull &&
            col("loser") =!= col("winner"))
        EvalMetrics.bradleyTerry(m, "winner", "loser", iters = 4).count()
      }))

    def selected(docs: DataFrame, ev: DataFrame): Seq[(String, () => Long)] =
      only.fold(queries(docs, ev))(s => queries(docs, ev).filter(kv => s(kv._1)))
    // warm both data paths + JIT once before any measurement
    selected(docs1, ev1).foreach { case (_, f) => f() }

    val rows = selected(docs1, ev1).zip(selected(docs10, ev10)).map {
      case ((name, f1), (_, f10)) =>
        // operator-local persist cuts from the PREVIOUS op must not skew
        // this op's measurement via cache-eviction churn (the Bench /
        // Verify per-query clearCache contract)
        spark.catalog.clearCache()
        val t1 = time(f1())
        spark.catalog.clearCache()
        val t10 = time(f10())
        (name, t1, t10, t10 / t1)
    }
    println(f"[scale] ${"operator"}%-18s ${"1x"}%8s ${"10x"}%8s ratio")
    rows.foreach { case (n, t1, t10, r) =>
      println(f"[scale] $n%-18s $t1%8.2f $t10%8.2f $r%5.1f")
    }
    spark.stop()
  }
}
