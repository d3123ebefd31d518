package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSuite

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog and keeps on running far away"),
    (2L, "short but long enough to pass the sixty-four byte minimum filter here ok"),
    (3L, "tiny")).toDF("doc_id", "text")

  test("withBinaryPayload produces binary with UTF-8 byte length") {
    val r = Multimodal.withBinaryPayload(docs, "text")
      .select(col("doc_id"), octet_length(col("payload")).as("n"), length(col("text")).as("c"))
      .as[(Long, Int, Int)].collect().toMap2
    assert(r(1L) == ((73, 73))) // pure ASCII: bytes == chars
  }

  test("imageMeta stub is deterministic and typed") {
    val m = Multimodal.withBinaryPayload(docs, "text")
      .select(col("doc_id"), Multimodal.imageMeta(col("payload")).as("m"))
      .select("doc_id", "m.n_bytes", "m.width", "m.height", "m.format")
      .where(col("doc_id") === 1).collect()(0)
    assert(m.getInt(1) == 73)
    assert(m.getInt(2) == 64 + 73 % 1217)
    assert(m.getInt(3) == 64 + (73 * 31) % 689)
    assert(m.getString(4) == Seq("jpeg", "png", "webp")((73 % 3)))
  }

  test("frameSampleHex: 4 evenly spaced 8-byte frames; first frame is the prefix") {
    val frames = Multimodal.withBinaryPayload(docs.where(col("doc_id") === 1), "text")
      .select(Multimodal.frameSampleHex(col("payload"), 4, 8).as("f"))
      .as[Seq[String]].collect()(0)
    assert(frames.length == 4)
    assert(frames.forall(_.length == 16))
    assert(frames(0) == "the quic".getBytes("UTF-8").map("%02X".format(_)).mkString)
  }

  test("audioWindows: sample-accurate offsets, tail below one window dropped") {
    // payload of 100 'a' bytes; 8kHz mono 16-bit, 4ms window = 64 bytes,
    // 2ms hop = 32 bytes -> windows at 0 and 32 (64+32=96 <= 100, next
    // start 64 would need 128 > 100); a 63-byte payload emits nothing
    val docs = Seq((1L, "a" * 100), (2L, "b" * 63)).toDF("doc_id", "text")
    val got = Multimodal.audioWindows(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload",
      sampleRate = 8000, windowMs = 4, hopMs = 2)
      .select("doc_id", "window_idx", "start_byte", "n_bytes", "window_md5")
      .as[(Long, Int, Long, Int, String)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._4)) == Seq((1L, 0, 0L, 64), (1L, 1, 32L, 64)))
    // identical bytes -> identical window digests at both offsets
    assert(got(0)._5 == got(1)._5 && got(0)._5.length == 32)
    // sub-sample window parameters are rejected (3ms at 8kHz mono is
    // whole samples, but 1ms at 999Hz is not)
    intercept[IllegalArgumentException] {
      Multimodal.audioWindows(docs.toDF("doc_id", "text"), "doc_id", "text",
        sampleRate = 999, windowMs = 1, hopMs = 1)
    }
  }

  test("decodeBatched: partition-wise batches with the stub codec") {
    val out = Multimodal.decodeBatched(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload", batchSize = 2)
      .collect().map(m => m.id -> m).toMap
    assert(out.size == 3)
    assert(out(3L).nBytes == 4)
    assert(out(3L).head == "decoded:4:" + "tiny".getBytes.take(4).map("%02x".format(_)).mkString)
  }

  test("resizeBatched: deterministic (payload, dims) fingerprint per row") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq((7L, "payload-bytes"), (8L, "x")).toDF("id", "text")
      .withColumn("payload", org.apache.spark.sql.functions.encode(col("text"), "UTF-8"))
    val out = Multimodal.resizeBatched(df, "id", "payload", width = 64, height = 48)
      .collect().map(r => r.id -> r).toMap
    assert(out(7L).srcBytes == 13 && out(7L).width == 64 && out(7L).height == 48)
    val md = java.security.MessageDigest.getInstance("MD5")
    md.update("payload-bytes".getBytes("UTF-8")); md.update("64x48".getBytes("UTF-8"))
    assert(out(7L).resizedMd5 == md.digest().map("%02x".format(_)).mkString)
    // different payloads and dims fingerprint differently
    assert(out(8L).resizedMd5 != out(7L).resizedMd5)
  }

  test("sceneCuts: planted intensity jump yields exactly one cut and two scenes") {
    // 32 'a's then 32 'z's: frames 0,1 sample the a-region (sum 776),
    // frames 2,3 the z-region (sum 976) -> one cut at frame 2
    val docs = Seq((1L, "a" * 32 + "z" * 32)).toDF("doc_id", "text")
    val got = Multimodal.sceneCuts(
      Multimodal.withBinaryPayload(docs, "text"), "doc_id", "payload",
      frames = 4, frameBytes = 8, threshold = 40L)
      .as[(Long, Int, Long, Boolean, Int)].collect().sortBy(_._2).toSeq
    assert(got == Seq(
      (1L, 0, 776L, false, 0), (1L, 1, 776L, false, 0),
      (1L, 2, 976L, true, 1), (1L, 3, 976L, false, 1)))
  }

  test("vadSegments: planted loud/silent PCM blocks yield exact energies and island numbering") {
    // non-overlapping 64-byte windows (windowMs == hopMs): blocks
    // silent, loud, silent, loud, loud -> active F T F T T ->
    // segments -1, 1, -1, 2, 2; loud sample = 32767 LE (0xFF 0x7F)
    val silent = Array.fill(64)(0.toByte)
    val loud = Array.fill(32)(Array(0xFF.toByte, 0x7F.toByte)).flatten
    val pcm = silent ++ loud ++ silent ++ loud ++ loud
    val df = Seq((1L, pcm)).toDF("doc_id", "payload")
    val got = Multimodal.vadSegments(df, "doc_id", "payload",
        sampleRate = 8000, windowMs = 4, hopMs = 4, thresholdPerSample = 1000L)
      .as[(Long, Int, Long, Boolean, Long)].collect().sortBy(_._2).toSeq
    val e = 32L * 32767L
    assert(got == Seq(
      (1L, 0, 0L, false, -1L), (1L, 1, e, true, 1L), (1L, 2, 0L, false, -1L),
      (1L, 3, e, true, 2L), (1L, 4, e, true, 2L)))
    // a negative-sample window: 0x00 0x80 = -32768 -> |.| sums the same
    val neg = Array.fill(32)(Array(0x00.toByte, 0x80.toByte)).flatten
    val g2 = Multimodal.vadSegments(Seq((2L, neg)).toDF("doc_id", "payload"),
        "doc_id", "payload", 8000, 4, 4, 1000L)
      .as[(Long, Int, Long, Boolean, Long)].collect().head
    assert(g2 == ((2L, 0, 32L * 32768L, true, 1L)))
  }

  test("clipScoreGate matches a JVM brute-force of both stub embeddings") {
    val texts = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and keeps running"),
      (2L, "aaa aaa aaa aaa aaa aaa aaa aaa"),
      (3L, "Mixed CASE Words With   extra  spaces inside the caption text"),
      (4L, "abcd"))
    def brute(text: String): Double = {
      val bytes = text.getBytes("UTF-8")
      val stride = (bytes.length - 4) / 15
      val iv = (0 until 16).map(i => (0 until 4).map(j => bytes(i * stride + j) & 0xff).sum.toLong)
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val tv = {
        val counts = new Array[Long](16)
        toks.foreach { t =>
          val h = java.security.MessageDigest.getInstance("MD5").digest(t.getBytes("UTF-8"))
          val b = (((h(0) & 0xffL) << 16) | ((h(1) & 0xffL) << 8) | (h(2) & 0xffL)) % 16
          counts(b.toInt) += 1
        }
        counts.toSeq
      }
      val dot = iv.zip(tv).map { case (a, b) => a * b }.sum
      val n1 = iv.map(a => a * a).sum
      val n2 = tv.map(a => a * a).sum
      if (n1 > 0 && n2 > 0) dot.toDouble / (math.sqrt(n1.toDouble) * math.sqrt(n2.toDouble))
      else 0.0
    }
    val out = Multimodal.clipScoreGate(
      Multimodal.withBinaryPayload(texts.toDF("doc_id", "text"), "text"),
      "doc_id", "payload", "text", threshold = 0.5)
      .as[(Long, Double, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    texts.foreach { case (id, t) =>
      val want = brute(t)
      assert(out(id)._1 == want, s"doc $id: ${out(id)._1} != $want")
      assert(out(id)._2 == (want >= 0.5))
    }
  }

  private implicit class ToMap2[A, B, C](s: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = s.map(t => t._1 -> ((t._2, t._3))).toMap
  }
}
