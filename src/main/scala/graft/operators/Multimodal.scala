package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._

import graft.operators.Materialize.MatOps

/** Multimodal-column operators: image/audio/video as opaque `binary`
  * payloads with typed metadata, decoded partition-wise in batches.
  *
  * The container has no image/audio codecs, so the decode step is a
  * clearly-marked DETERMINISTIC STUB ([[fakeDecode]]); everything around
  * it — the binary column plumbing, metadata schema, batch shape, and
  * partition-wise execution — is real and tested. A deployment swaps
  * `fakeDecode` for a codec call without touching the plan shape.
  *
  * Scale notes: payloads never pass through a Spark shuffle here (all
  * operators are per-row projections or `mapPartitions`); metadata columns
  * are the only thing downstream aggregates touch, so column pruning drops
  * the heavy binary column as soon as it is unused.
  */
object Multimodal {

  /** Stand-in payload: testdata has no binary table, so documents' text
    * bytes act as the opaque payload (UTF-8 encode — same plumbing).
    */
  def withBinaryPayload(docs: DataFrame, textCol: String): DataFrame =
    docs.withColumn("payload", encode(col(textCol), "UTF-8"))

  /** STUB decode: deterministic fake image metadata derived from payload
    * size — stands in for a codec's header parse. Pure column arithmetic
    * so the correctness harness can oracle the plumbing end-to-end.
    */
  def imageMeta(bin: Column): Column = struct(
    octet_length(bin).as("n_bytes"),
    (lit(64) + pmod(octet_length(bin), lit(1217))).as("width"),
    (lit(64) + pmod(octet_length(bin) * 31, lit(689))).as("height"),
    element_at(array(lit("jpeg"), lit("png"), lit("webp")), pmod(octet_length(bin), lit(3)) + 1).as("format"))

  /** Evenly-spaced fixed-size byte windows ("frames") of a binary payload,
    * as uppercase hex strings (hex-domain slicing: 2 chars per byte).
    * Caller guarantees `octet_length(bin) >= frameBytes`.
    */
  def frameSampleHex(bin: Column, frames: Int, frameBytes: Int): Column = {
    require(frames >= 2, "need at least 2 frames for spacing")
    val h = hex(bin)
    val stride = floor((octet_length(bin) - frameBytes) / lit(frames - 1)).cast("int")
    array((0 until frames).map { i =>
      h.substr((lit(i) * stride * 2 + 1).cast("int"), lit(frameBytes * 2))
    }: _*)
  }

  /** Sample-accurate PCM window slicing — the audio-side prep step of a
    * multimodal pipeline (VAD / feature windows / speech-chunking), and
    * REAL arithmetic rather than a codec stub: raw PCM needs no decode,
    * only frame math. Given the stream's PCM layout, each payload
    * yields windows of `windowMs` every `hopMs`:
    * (`window_idx`, `start_byte`, `n_bytes`, `window_md5` — the digest
    * standing in for the feature extractor a deployment plugs in).
    * Payloads shorter than one window emit nothing.
    *
    * Bounded explode (fan-out ≈ payload/hop, the [[TextAnalysis.chunkTokens]]
    * shape); the digest collapses each slice BEFORE any exchange, so
    * payload bytes never shuffle. Window parameters must land on whole
    * samples (asserted) — sample-accuracy is the operator's contract.
    */
  def audioWindows(df: DataFrame, idCol: String, binCol: String,
                   sampleRate: Int, windowMs: Int, hopMs: Int,
                   bitsPerSample: Int = 16, channels: Int = 1): DataFrame = {
    require(sampleRate > 0 && windowMs > 0 && hopMs > 0 && channels > 0,
      "positive sampleRate/windowMs/hopMs/channels")
    require(bitsPerSample % 8 == 0, "whole-byte sample depth")
    require(sampleRate.toLong * windowMs % 1000 == 0 && sampleRate.toLong * hopMs % 1000 == 0,
      s"windowMs/hopMs must be whole samples at $sampleRate Hz")
    val bytesPerFrame = bitsPerSample / 8 * channels
    val winBytes = sampleRate * windowMs / 1000 * bytesPerFrame
    val hopBytes = sampleRate * hopMs / 1000 * bytesPerFrame
    df.select(col(idCol), upper(hex(col(binCol))).as("_h"),
        octet_length(col(binCol)).cast("long").as("_nb"))
      .where(col("_nb") >= winBytes)
      .select(col(idCol), col("_h"),
        explode(sequence(lit(0L), expr(s"(_nb - $winBytes) div $hopBytes"))).as("_wi"))
      .select(col(idCol),
        col("_wi").cast("int").as("window_idx"),
        (col("_wi") * hopBytes).cast("long").as("start_byte"),
        lit(winBytes).as("n_bytes"),
        md5(col("_h").substr((col("_wi") * hopBytes * 2 + 1).cast("int"), lit(winBytes * 2)))
          .as("window_md5"))
  }

  /** Energy-based voice-activity detection over the PCM window grid —
    * REAL signal arithmetic like [[audioWindows]], not a codec stub:
    * each window's energy is the exact int64 sum of |signed 16-bit LE
    * sample| over its bytes, a window is active when its energy clears
    * `thresholdPerSample` per sample, and consecutive active windows
    * coalesce into numbered speech segments (the islands trick,
    * [[sceneCuts]]'s discipline). This is the speech-chunking front of
    * an audio pipeline (what feeds an ASR batch or a diarizer).
    *
    * Emits one row per window: (`idCol`, window_idx, energy, active,
    * segment — the 1-based active-run index, −1 on silence).
    *
    * Plan: windows explode payload/hop-bounded ([[audioWindows]]'s
    * fan-out); the sample fold is a per-row array HOF (payload bytes
    * reduce to one int64 BEFORE any exchange); the only shuffle is the
    * per-id window ordering for the island numbering.
    */
  def vadSegments(df: DataFrame, idCol: String, binCol: String,
                  sampleRate: Int, windowMs: Int, hopMs: Int,
                  thresholdPerSample: Long): DataFrame = {
    require(sampleRate > 0 && windowMs > 0 && hopMs > 0, "positive layout")
    require(sampleRate.toLong * windowMs % 1000 == 0 && sampleRate.toLong * hopMs % 1000 == 0,
      s"windowMs/hopMs must be whole samples at $sampleRate Hz")
    import org.apache.spark.sql.expressions.Window
    val samples = sampleRate * windowMs / 1000
    val winBytes = samples * 2
    val hopBytes = sampleRate * hopMs / 1000 * 2
    val energy = aggregate(
      transform(sequence(lit(0), lit(samples - 1)), k => {
        val raw = conv(col("_wh").substr(k * 4 + 1, lit(2)), 16, 10).cast("long") +
          conv(col("_wh").substr(k * 4 + 3, lit(2)), 16, 10).cast("long") * 256L
        abs(when(raw >= 32768L, raw - 65536L).otherwise(raw))
      }),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col(idCol)).orderBy(col("window_idx"))
    val run = Window.partitionBy(col(idCol)).orderBy(col("window_idx"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(col(idCol), upper(hex(col(binCol))).as("_h"),
        octet_length(col(binCol)).cast("long").as("_nb"))
      .where(col("_nb") >= winBytes)
      .select(col(idCol), col("_h"),
        explode(sequence(lit(0L), expr(s"(_nb - $winBytes) div $hopBytes"))).as("_wi"))
      .select(col(idCol), col("_wi").cast("int").as("window_idx"),
        col("_h").substr((col("_wi") * hopBytes * 2 + 1).cast("int"), lit(winBytes * 2)).as("_wh"))
      .withColumn("energy", energy)
      .withColumn("active", col("energy") > thresholdPerSample * samples)
      .withColumn("_prev", lag(col("active"), 1).over(w))
      .withColumn("_new",
        when(col("active") && (col("_prev").isNull || !col("_prev")), 1L).otherwise(0L))
      .withColumn("segment",
        when(col("active"), sum(col("_new")).over(run)).otherwise(lit(-1L)))
      .select(col(idCol), col("window_idx"), col("energy"), col("active"), col("segment"))
  }

  final case class DecodedMeta(id: Long, nBytes: Int, head: String)

  final case class ResizedMeta(id: Long, srcBytes: Int, width: Int, height: Int, resizedMd5: String)

  /** Partition-wise batched STUB resize: the per-image output is a
    * deterministic md5 fingerprint of (payload, target dims) standing in
    * for resized bytes — a real deployment swaps the digest for the
    * codec's scale call; the batch shape, schema, and partition-wise
    * execution are the real plumbing (per-batch block is where a codec
    * would pin buffers once). Payloads never shuffle.
    */
  def resizeBatched(df: DataFrame, idCol: String, binCol: String,
                    width: Int, height: Int, batchSize: Int = 64): Dataset[ResizedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    val dims = s"${width}x$height".getBytes("UTF-8")
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val md = java.security.MessageDigest.getInstance("MD5") // per-batch setup
          batch.map { case (id, bytes) =>
            md.reset()
            md.update(bytes)
            md.update(dims)
            ResizedMeta(id, bytes.length, width, height,
              md.digest().map("%02x".format(_)).mkString)
          }
        }
      }
  }

  /** STUB codec: deterministic "decode" of a payload (length + first-bytes
    * fingerprint). Replace with a real image/audio library call.
    */
  def fakeDecode(bytes: Array[Byte]): String =
    s"decoded:${bytes.length}:${bytes.take(4).map("%02x".format(_)).mkString}"

  /** Partition-wise batched decode — the Scala analog of a `mapInPandas`
    * batch UDF: each partition's rows are processed in `batchSize` groups
    * so a real codec can amortize per-batch setup (model load, pinned
    * buffers) exactly as a Pandas batch would.
    */
  def decodeBatched(df: DataFrame, idCol: String, binCol: String,
                    batchSize: Int = 64,
                    decode: Array[Byte] => String = fakeDecode): Dataset[DecodedMeta] = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol)).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          // per-batch setup would go here (codec/model initialization)
          batch.map { case (id, bytes) => DecodedMeta(id, bytes.length, decode(bytes)) }
        }
      }
  }

  /** Video shot/scene-change detection over sampled frames — the
    * frame-selection step before a captioning or frame-dedup pass:
    * sample `frames` evenly-spaced byte windows ([[frameSampleHex]]),
    * reduce each to a scalar intensity (the byte sum — standing in for
    * a luminance histogram, the same honest-stub discipline as
    * [[fakeDecode]]: the FEATURE is a stub, the detection pipeline —
    * per-frame reduce, lag delta, threshold, running scene index — is
    * the real algorithm), and cut wherever consecutive intensities
    * jump by more than `threshold`. Emits (`idCol`, `frame_idx`,
    * `intensity`, `is_cut`, `scene_idx`).
    *
    * Per-payload map work + one bounded window (partition = payload,
    * `frames` rows) — shuffle cost is the frame table, never the
    * payload bytes.
    */
  def sceneCuts(df: DataFrame, idCol: String, binCol: String,
                frames: Int, frameBytes: Int, threshold: Long): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val fr = df
      .where(octet_length(col(binCol)) >= frameBytes)
      .select(col(idCol),
        posexplode(frameSampleHex(col(binCol), frames, frameBytes))
          .as(Seq("frame_idx", "_fh")))
    val intensity = aggregate(
      transform(sequence(lit(0), lit(frameBytes - 1)),
        i => conv(col("_fh").substr(i * 2 + 1, lit(2)), 16, 10).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val w = Window.partitionBy(col(idCol)).orderBy(col("frame_idx"))
    fr.withColumn("intensity", intensity)
      .withColumn("_prev", lag(col("intensity"), 1).over(w))
      .withColumn("is_cut",
        col("_prev").isNotNull && abs(col("intensity") - col("_prev")) > threshold)
      .withColumn("scene_idx",
        sum(when(col("is_cut"), 1L).otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)).cast("int"))
      .select(col(idCol), col("frame_idx"), col("intensity"), col("is_cut"), col("scene_idx"))
  }

  /** Perceptual-hash near-duplicate pairs over binary payloads — the
    * image-side MinHash: byte-identical dedup ([[graft.operators.Dedup]]
    * on the blob fingerprint) misses re-encoded copies, so production
    * pipelines hash a decoded, downscaled representation instead. The
    * DECODE here is the honest stub ([[fakeDecode]] discipline): 48
    * evenly-spaced byte-window intensities stand in for the 48
    * downscaled-pixel luminances; everything downstream — the
    * average-hash bit rule (pixel > mean, computed as the exact integer
    * cross-multiplication `intensity·48 > total`), the 48-bit packed
    * hash, the band-bucketed candidate join, the Hamming verification
    * `bit_count(a XOR b) ≤ maxHamming` — is the real aHash pipeline
    * (Krawetz's average hash; swap the stub for a real decoder and the
    * plan is unchanged).
    *
    * Plan at 100 TB: payload bytes never shuffle — each blob reduces to
    * one (id, 48-bit hash) row; candidates come from an equi-join on
    * the top-16-bit band (a near-dup pair differing in ≤ maxHamming of
    * 48 bits collides on the exact top band unless a flipped bit lands
    * there — the single-band approximation; production adds rotated
    * bands exactly like the MinHash LSH operator). Verification is one
    * integer XOR popcount per candidate.
    */
  def perceptualHashPairs(df: DataFrame, idCol: String, binCol: String,
                          maxHamming: Int = 6): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tiles = 48
    val fr = df
      .where(octet_length(col(binCol)) >= 4)
      .select(col(idCol),
        posexplode(frameSampleHex(col(binCol), tiles, 4)).as(Seq("tile_idx", "_th")))
    val intensity = aggregate(
      transform(sequence(lit(0), lit(3)),
        i => conv(col("_th").substr(i * 2 + 1, lit(2)), 16, 10).cast("long")),
      lit(0L), (acc, x) => acc + x)
    val hashed = fr
      .withColumn("_i", intensity)
      .withColumn("_tot", sum(col("_i")).over(Window.partitionBy(col(idCol))))
      .groupBy(col(idCol))
      .agg(sum(when(col("_i") * tiles > col("_tot"),
        expr("shiftleft(CAST(1 AS BIGINT), tile_idx)")).otherwise(0L)).as("phash"))
      .withColumn("band", expr("shiftright(phash, 32)"))
      .materialized // both legs of the candidate self-join
    val left = hashed.select(col("band"), col(idCol).as("id_a"), col("phash").as("_ha"))
    val right = hashed.select(col("band").as("_b2"), col(idCol).as("id_b"), col("phash").as("_hb"))
    left.join(right, col("band") === col("_b2") && col("id_a") < col("id_b"))
      .withColumn("hamming", expr("bit_count(_ha ^ _hb)"))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"),
        col("_ha").as("phash_a"), col("_hb").as("phash_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  /** CLIP-score-style image–caption alignment gate — the LAION-400M/5B
    * curation filter: embed the image, embed the caption, keep the
    * pair when the embeddings' cosine clears a threshold (LAION used
    * 0.28 on real CLIP; the threshold here is calibrated to the stub).
    * The image embedding is the STUB feature (16 evenly-spaced tile
    * intensities over the payload bytes — [[frameSampleHex]], standing
    * in for a vision tower exactly like [[fakeDecode]] stands in for a
    * codec); the caption embedding is a REAL 16-dim hashing-trick
    * bag-of-words (md5 token buckets, the [[graft.operators.Similarity]]
    * hashEmbed recipe). A deployment swaps the two embed expressions
    * for model calls without touching the gate.
    *
    * Emits (`idCol`, clip_score, kept); zero-norm sides score 0.0
    * (never NaN — both engines would disagree on NaN compares).
    *
    * Plan: ENTIRELY shuffle-free — both embeddings, the dot, the norms
    * and the gate are per-row projections (array HOFs over 16-element
    * integer vectors; exact int64 everywhere, ONE float chain per
    * row), so the filter rides the ingest scan at any corpus size —
    * the embarrassing parallelism that let LAION filter 50B pairs.
    */
  def clipScoreGate(df: DataFrame, idCol: String, binCol: String, textCol: String,
                    threshold: Double = 0.95): DataFrame = {
    val dims = 16
    val imgVec = transform(frameSampleHex(col(binCol), dims, 4), th =>
      aggregate(transform(sequence(lit(0), lit(3)),
        i => conv(th.substr(i * 2 + 1, lit(2)), 16, 10).cast("long")),
        lit(0L), (acc, x) => acc + x))
    val buckets = expr(
      s"transform(split(lower(trim($textCol)), '\\\\s+'), " +
        s"t -> CAST(conv(substring(md5(t), 1, 6), 16, 10) AS BIGINT) % $dims)")
    val txtVec = transform(sequence(lit(0), lit(dims - 1)),
      d => aggregate(col("_bk"), lit(0L),
        (acc, b) => acc + when(b === d.cast("long"), 1L).otherwise(0L)))
    def sq(v: Column): Column =
      aggregate(transform(v, a => a * a), lit(0L), (acc, x) => acc + x)
    val dot = aggregate(zip_with(col("_iv"), col("_tv"), (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    df.where(octet_length(col(binCol)) >= 4)
      .withColumn("_bk", buckets)
      .withColumn("_iv", imgVec)
      .withColumn("_tv", txtVec)
      .withColumn("_dot", dot)
      .withColumn("_n1", sq(col("_iv")))
      .withColumn("_n2", sq(col("_tv")))
      .select(col(idCol),
        when(col("_n1") > 0 && col("_n2") > 0,
          col("_dot").cast("double")
            / (sqrt(col("_n1").cast("double")) * sqrt(col("_n2").cast("double"))))
          .otherwise(lit(0.0)).as("clip_score"))
      .withColumn("kept", col("clip_score") >= threshold)
    // no ordering here: the gate stays a pure projection (zero
    // exchanges); the driver-contract query sorts its dump itself
  }
}
