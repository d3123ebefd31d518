package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSuite

class NfcCleanSpec extends SparkSuite {
  import spark.implicits._

  graft.plans.GraftExtensions.register(spark)

  private def clean(s: String): String =
    Seq(s).toDF("t").select(call_function("nfc_clean", col("t"))).as[String].head()

  test("composes decomposed sequences to NFC") {
    // e + COMBINING ACUTE -> precomposed U+00E9
    assert(clean("café") == "café")
    // ANGSTROM SIGN (compatibility singleton) -> U+00C5
    assert(clean("Å") == "Å")
    // A + COMBINING RING ABOVE -> U+00C5
    assert(clean("Å") == "Å")
  }

  test("strips C0 controls and DEL but keeps tab, newline, carriage return") {
    assert(clean("abcd") == "abcd")
    assert(clean("a\tb\nc\rd") == "a\tb\nc\rd")
  }

  test("ASCII-clean input passes through unchanged (identity fast path)") {
    val s = "plain ascii text 123"
    assert(clean(s) == s)
    // already-NFC non-ASCII also passes through
    assert(clean("café Å") == "café Å")
  }

  test("matches java.text.Normalizer on random mixed strings (randomized property)") {
    val rnd = new scala.util.Random(47)
    val pool = "abcXYZ 123́̊éÅÅ\t\n".toCharArray
    (0 until 40).foreach { _ =>
      val s = Seq.fill(1 + rnd.nextInt(20))(pool(rnd.nextInt(pool.length))).mkString
      val want = java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC)
        .filterNot(c => (c < 0x20 && c != '\t' && c != '\n' && c != '\r') || c == 0x7f)
      assert(clean(s) == want, s"input ${s.map(_.toInt.toHexString).mkString(",")}")
    }
  }
}
