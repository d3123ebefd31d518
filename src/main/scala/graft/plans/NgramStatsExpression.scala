package graft.plans

import java.util.regex.Pattern

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Word n-gram OCCURRENCE statistics of a text column in one pass —
  * the per-document repetition signals of a Gopher-style quality filter
  * (Rae et al. 2021, §A1.1: "fraction of duplicate n-grams" / "fraction
  * of the text in the top n-gram"): over the sequence (with duplicates)
  * of word n-grams of trim → lower → whitespace-split text, returns
  *
  *   struct(n_ngrams        total n-gram occurrences,
  *          top_count       occurrences of the most frequent n-gram,
  *          dup_occurrences occurrences belonging to n-grams seen > 1×)
  *
  * or null when the document has fewer than n tokens. The normalization
  * and n-gram join are byte-identical to [[ShingleHashes]] (same trim /
  * lower / split semantics, same xxhash64 seed) — but where shingles
  * DISCARD multiplicity (a set for MinHash/Jaccard), repetition scoring
  * is ABOUT multiplicity, so this kernel counts run lengths instead of
  * deduplicating. Counting is sort + run-scan over the hash array — no
  * per-row hash-map allocation, O(n log n) on n-gram count, zero boxing.
  *
  * A hash collision would merge two distinct n-grams' counts; at
  * xxhash64 width the per-document probability is ~m²/2⁶⁴ — the same
  * accepted regime as every other hashed-text operator here (the DuckDB
  * oracle counts the n-gram STRINGS; equality is asserted across the
  * test corpus).
  *
  * Per-row map work: the whole quality pass stays shuffle-free at
  * 100 TB, like the rest of [[graft.operators.TextAnalysis]].
  */
final case class NgramStats(child: Expression, n: Int) extends UnaryExpression {

  require(n >= 1, "n-gram width must be >= 1")

  override def dataType: DataType = NgramStats.Schema

  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"ngram_stats expects string, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    NgramStats.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val boxed = ctx.freshName("ngramStats")
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        InternalRow ${ev.value} = null;
        if (!${childGen.isNull}) {
          InternalRow $boxed = graft.plans.NgramStats.compute(${childGen.value}, $n);
          if ($boxed != null) { ${ev.isNull} = false; ${ev.value} = $boxed; }
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "ngram_stats"
}

object NgramStats {

  val Schema: StructType = StructType(Seq(
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("top_count", IntegerType, nullable = false),
    StructField("dup_occurrences", IntegerType, nullable = false)))

  private val Whitespace = Pattern.compile("\\s+")
  private val Seed = 42L // Spark's xxhash64() default seed

  /** Static entry the generated code calls; null when < n tokens. */
  def compute(input: UTF8String, n: Int): InternalRow = {
    val s = input.trim().toLowerCase.toString
    val toks = Whitespace.split(s, -1)
    val m = toks.length - n + 1
    if (m <= 0) return null
    val hashes = new Array[Long](m)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < m) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      hashes(i) = XxHash64Function.hash(UTF8String.fromString(sb.toString), StringType, Seed)
      i += 1
    }
    java.util.Arrays.sort(hashes)
    var top = 0
    var dup = 0
    var run = 1
    i = 1
    while (i <= m) {
      if (i < m && hashes(i) == hashes(i - 1)) run += 1
      else {
        if (run > top) top = run
        if (run > 1) dup += run
        run = 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](m, top, dup))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[NgramStats].getName, "ngram_stats")
}
