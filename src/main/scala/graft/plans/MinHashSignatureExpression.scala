package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Per-row MinHash signature: `numHashes` permutations
  * h_j(x) = ((x mod dom) · a_j + b_j) mod p folded over a shingle-hash
  * array, min per permutation — the whole signature in one codegen'd
  * `shingles × numHashes` primitive loop.
  *
  * This makes the signature build SHUFFLE-FREE: the previous form
  * (explode shingles → groupBy(doc) with `numHashes` min-aggregates) is a
  * full shuffle of n·shingles rows; at 100 TB that exchange is the
  * operator's bottleneck, while this expression is pure map work pushed
  * into whole-stage codegen. Values are identical (same pmod arithmetic,
  * same min), asserted against the aggregate form in DedupSpec.
  *
  * Returns null for an empty (or null) shingle array — the explode form
  * simply produced no row for such docs, and callers filter nulls to keep
  * that semantic.
  */
final case class MinHashSignature(child: Expression, a: Seq[Long], b: Seq[Long],
                                  p: Long, dom: Long) extends UnaryExpression {

  require(a.nonEmpty && a.length == b.length, "coefficient arrays must be non-empty and same length")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"minhash_signature expects array<long>, got $t")
  }

  @transient private lazy val aArr = a.toArray
  @transient private lazy val bArr = b.toArray

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else MinHashSignature.signature(v.asInstanceOf[ArrayData], aArr, bArr, p, dom)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("aCoefs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("bCoefs", bArr, "long[]")
    val childGen = child.genCode(ctx)
    val code =
      code"""
        ${childGen.code}
        boolean ${ev.isNull} = true;
        org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
        if (!${childGen.isNull}) {
          ${ev.value} = graft.plans.MinHashSignature.signature(
            ${childGen.value}, $aRef, $bRef, ${p}L, ${dom}L);
          ${ev.isNull} = ${ev.value} == null;
        }
      """
    ev.copy(code = code)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "minhash_signature"
}

/** All `bands` LSH band keys of a MinHash signature in one pass:
  * element b is the Murmur3 hash (seed 42 — Spark's `hash()`) of the
  * signature slice `[b·rows, b·rows+rows)`, bit-identical to
  * `hash(slice(signature, b*rows+1, rows))`. Replaces `bands` separate
  * struct(hash(slice(..))) column trees — at bands=32 that tree
  * dominated the minhash plan's codegen size and first-run compile time.
  */
final case class BandHashes(child: Expression, bands: Int, rows: Int) extends UnaryExpression {

  require(bands >= 1 && rows >= 1, "bands and rows must be >= 1")

  override def dataType: DataType = ArrayType(org.apache.spark.sql.types.IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"band_hashes expects array<long>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    BandHashes.compute(input.asInstanceOf[ArrayData], bands, rows)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BandHashes.compute($c, $bands, $rows)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "band_hashes"
}

object BandHashes {

  /** Static entry the generated code calls. Mirrors Spark's Murmur3
    * array hash exactly: fold h ← hashLong(elem, h) from seed 42 over
    * the slice elements (nulls skipped, as `hash()` does).
    */
  def compute(sig: ArrayData, bands: Int, rows: Int): ArrayData = {
    val n = sig.numElements()
    val out = new Array[Int](bands)
    var b = 0
    while (b < bands) {
      // Murmur3HashFunction.hashLong(l, seed) delegates to
      // Murmur3_x86_32.hashLong(l, seed.toInt) — same fold, int carry
      var h = 42
      var r = b * rows
      val end = math.min(r + rows, n)
      while (r < end) {
        if (!sig.isNullAt(r))
          h = org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(sig.getLong(r), h)
        r += 1
      }
      out(b) = h
      b += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[BandHashes].getName, "band_hashes")
}

object MinHashSignature {

  /** Static entry the generated code calls (named `signature`, not `eval`
    * — see the static-forwarder note in [[SnakeCase.convert]]). Null
    * elements are skipped (the explode form's `where isNotNull`).
    */
  def signature(arr: ArrayData, a: Array[Long], b: Array[Long], p: Long, dom: Long): ArrayData = {
    val n = arr.numElements()
    val k = a.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val xm = java.lang.Math.floorMod(arr.getLong(i), dom)
        var j = 0
        while (j < k) {
          val h = (xm * a(j) + b(j)) % p
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature")
}
