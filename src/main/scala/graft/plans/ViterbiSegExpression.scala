package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Viterbi word segmentation — the lattice DP core of
  * `UnigramLm.viterbiSeg` — with the lattice generated INSIDE the
  * kernel from a driver-side cost map.
  *
  * The composed form ran BOTH lattice folds (forward shortest-path +
  * backward argmin walk) as `aggregate` HOFs, which are CodegenFallback:
  * every DP step interpreted a filter + transform + array_min (forward)
  * or a filter + transform + array_sort (backward) over the word's edge
  * list — O(n²·pieceLen) boxed lambda evaluations per distinct word,
  * paid by every spm_* query (two fits worth for the training rows).
  * It also had to MATERIALIZE the lattice as data: a substring explode
  * (≈ len·pieceLen rows per word), a broadcast cost join and a
  * collect_list re-group — two full exchanges of the piece table per EM
  * round. Here the edge of a (start, len) window is a substring lookup
  * in the vocabulary map, so each round is one projection over the
  * cached word table and the DP is one primitive loop per word.
  *
  * The vocabulary rides the driver as a literal reference (the k-means
  * centroid / perceptron weight-array discipline): bounded by
  * |alphabet| + the multi-piece budget here, and by the production
  * vocab envelope (≤ a few hundred thousand pieces, single-digit MB)
  * in general.
  *
  * Semantics mirror the composed HOF form EXACTLY (asserted in
  * UnigramLmSpec, incl. the unreachable-word null and unicode words):
  *
  *   - an edge exists for window (i, l) iff its substring is in the
  *     cost table — identical to the inner cost join;
  *   - forward: cst(0) = 0; cst(j) = min over edges with i + l − 1 == j
  *     of cst(i−1) + cfp, unreachable priors skipped like array_min
  *     skips nulls; unreachable END ⇒ null seg (the caller filters;
  *     byte-fallback territory);
  *   - backward from pos = n: among edges ending at pos with a
  *     reachable prior, pick the minimum of (cst(i−1) + cfp, −l, i) —
  *     the composed array_sort struct order (cost asc, longest piece,
  *     smallest start); emit the pieces joined by single spaces;
  *   - pieces are code-point substrings (UTF8String.substringSQL — the
  *     same semantics as the composed `word.substr(i, l)`).
  */
final case class ViterbiSegVocab(child: Expression, vocab: VocabHandle,
                                 pieceLen: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  require(pieceLen >= 1, s"pieceLen must be >= 1, got $pieceLen")

  private def costs: Seq[(String, Long)] = vocab.costs

  override def dataType: DataType = StringType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"viterbi_seg_vocab expects string, got $t")
  }

  @transient private lazy val costMap: java.util.HashMap[UTF8String, java.lang.Long] = {
    val m = new java.util.HashMap[UTF8String, java.lang.Long](costs.size * 2)
    costs.foreach { case (p, c) => m.put(UTF8String.fromString(p), java.lang.Long.valueOf(c)) }
    m
  }

  override protected def nullSafeEval(input: Any): Any =
    ViterbiSeg.segmentWithVocab(input.asInstanceOf[UTF8String], costMap, pieceLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabCosts", costMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, w => {
      s"""
        ${ev.value} = graft.plans.ViterbiSeg.segmentWithVocab($w, $ref, $pieceLen);
        ${ev.isNull} = (${ev.value} == null);
      """
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "viterbi_seg_vocab"
}

/** Opaque vocabulary handle for [[ViterbiSegVocab]]: the cost table is
  * a case-class constructor arg, so expression equality / hashCode /
  * canonicalization / toString would otherwise iterate (and print) the
  * WHOLE vocab on every plan comparison — at the production envelope
  * the doc anticipates (hundreds of thousands of pieces) that degrades
  * explain and analyzer passes even though eval uses the reference-
  * object map. The handle precomputes one content hash, compares by
  * (identity, then hash + deep compare on hash match), and prints a
  * truncated summary — the Broadcast-handle discipline.
  */
final class VocabHandle(val costs: Seq[(String, Long)]) extends Serializable {
  override val hashCode: Int =
    scala.util.hashing.MurmurHash3.orderedHash(costs, 0x5eed)
  override def equals(o: Any): Boolean = o match {
    case v: VocabHandle =>
      (this eq v) || (hashCode == v.hashCode && costs == v.costs)
    case _ => false
  }
  override def toString: String =
    s"vocab(${costs.size} pieces, hash=0x${hashCode.toHexString})"
}

object VocabHandle {
  def apply(costs: Seq[(String, Long)]): VocabHandle = new VocabHandle(costs)
}

object ViterbiSeg {

  /** [[ViterbiSegVocab]]'s DP — the static entry the generated code
    * calls (the [[DotProduct.compute]] naming discipline): forward
    * shortest path + backward argmin walk, edges generated on the fly
    * from the cost map.
    */
  def segmentWithVocab(word: UTF8String,
                       costs: java.util.HashMap[UTF8String, java.lang.Long],
                       pieceLen: Int): UTF8String = {
    val n = word.numChars()
    // the composed form emits NO row for an empty word (no lattice
    // edges ⇒ no group); null here makes the caller's filter drop it
    if (n == 0) return null
    // forward: cst(j) = best cost of tiling chars 1..j
    val cst = new Array[Long](n + 1)
    val reach = new Array[Boolean](n + 1)
    reach(0) = true
    var j = 1
    while (j <= n) {
      var l = 1
      val lMax = math.min(pieceLen, j)
      while (l <= lMax) {
        val i = j - l + 1
        if (reach(i - 1)) {
          val cfp = costs.get(word.substringSQL(i, l))
          if (cfp != null) {
            val c = cst(i - 1) + cfp.longValue()
            if (!reach(j) || c < cst(j)) { cst(j) = c; reach(j) = true }
          }
        }
        l += 1
      }
      j += 1
    }
    if (!reach(n)) return null
    // backward: min (prior + cfp, -l, i) among reachable-prior edges
    // ending at pos — identical order to the composed array_sort
    val pieceStart = new Array[Int](n)
    val pieceLenOut = new Array[Int](n)
    var nPieces = 0
    var pos = n
    while (pos > 0) {
      var bi = -1
      var bl = 0
      var bk = Long.MaxValue
      var l = 1
      val lMax = math.min(pieceLen, pos)
      while (l <= lMax) {
        val i = pos - l + 1
        if (reach(i - 1)) {
          val cfp = costs.get(word.substringSQL(i, l))
          if (cfp != null) {
            val k = cst(i - 1) + cfp.longValue()
            if (k < bk || (k == bk && (l > bl || (l == bl && i < bi)))) {
              bk = k; bi = i; bl = l
            }
          }
        }
        l += 1
      }
      if (bi < 0) throw new IllegalStateException(
        s"viterbi_seg_vocab: no edge ends at reachable position $pos")
      pieceStart(nPieces) = bi
      pieceLenOut(nPieces) = bl
      nPieces += 1
      pos = bi - 1
    }
    val sb = new java.lang.StringBuilder(word.numBytes() + nPieces)
    var p = nPieces - 1
    while (p >= 0) {
      sb.append(word.substringSQL(pieceStart(p), pieceLenOut(p)).toString)
      if (p > 0) sb.append(' ')
      p -= 1
    }
    UTF8String.fromString(sb.toString)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[ViterbiSegVocab].getName, "viterbi_seg_vocab")
}
