package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for LLM training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  * All pure built-in column expressions (split/regexp/aggregate) — no
  * per-row UDFs, fully codegen'd, scale-independent (per-row map work,
  * zero shuffles until the caller aggregates).
  */
object TextAnalysis {

  /** Whitespace tokens of lowered text. */
  def tokens(text: Column): Column = split(lower(trim(text)), "\\s+")

  /** BPE-ish subword count: maximal alphanumeric runs plus each single
    * non-alphanumeric char (incl. whitespace), approximating a byte-pair
    * tokenizer's token count without a vocab. One `regexp_count` — no
    * split-array allocation.
    */
  def bpeishTokenCount(text: Column): Column =
    regexp_count(text, lit("[a-zA-Z0-9]+|[^a-zA-Z0-9]"))

  /** Per-document quality metrics as a projection. */
  def qualityMetrics(docs: DataFrame, textCol: String): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    val nTok = size(toks)
    val stop = Seq("the", "a", "of", "and", "to", "in", "is", "it")
    docs
      .withColumn("n_tokens", nTok)
      .withColumn("n_distinct_tokens", size(array_distinct(toks)))
      .withColumn("n_chars_text", length(t))
      .withColumn("avg_token_len",
        length(regexp_replace(t, "\\s+", "")).cast("double") / nTok.cast("double"))
      .withColumn("stopword_hits", size(filter(toks, x => x.isInCollection(stop))))
      .withColumn("stopword_ratio", col("stopword_hits").cast("double") / nTok.cast("double"))
      .withColumn("distinct_ratio", col("n_distinct_tokens").cast("double") / nTok.cast("double"))
      .withColumn("punct_count", regexp_count(t, lit("[.,!?;:]")))
      .withColumn("is_quality",
        col("n_tokens") >= 10 && col("distinct_ratio") > 0.2 && col("avg_token_len") < 15.0)
  }

  /** Stopword-hit language-ID heuristic: count hits against small
    * per-language function-word lists, pick the argmax (deterministic
    * tie-break by fixed language order).
    */
  val langStopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in"),
    "es" -> Seq("el", "la", "de", "los", "que", "y"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une"),
    "ru" -> Seq("и", "в", "не", "на", "что", "это")
  )

  def langIdScores(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    langStopwords.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(filter(toks, x => x.isInCollection(words)))
    }
  }

  /** Fingerprints: md5 of normalized text + a polynomial rolling hash of
    * token lengths (mod 1e9+7, overflow-safe).
    */
  def fingerprint(text: Column): Column = md5(lower(trim(regexp_replace(text, "\\s+", " "))))

  def rollingHash(text: Column): Column =
    aggregate(tokens(text), lit(0L), (acc, x) => pmod(acc * lit(31L) + length(x), lit(1000000007L)))
}
