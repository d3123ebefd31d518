package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native best-fit bin-packing fold — the sequential placement core of
  * `CorpusSelection.packBestFit` / `packWaste`.
  *
  * The composed form is an `aggregate` HOF whose per-element step runs
  * two `transform`s plus an `array_max` over the current bin loads and
  * grows the bins array by `concat` — all CodegenFallback, so every
  * step interprets O(bins) lambda evaluations with boxed structs, and
  * the state concat copies O(docs) elements per step: O(docs·bins)
  * interpreted evals + O(docs²) copies per shard. Measured at sf0.1
  * that interpretation owned the whole query (pack_bestfit 14.8 s,
  * pack_waste ~13 s). This kernel is ONE tight primitive loop per
  * shard with a long[] loads buffer — same O(docs·bins) comparisons,
  * zero boxing, zero quadratic state copies.
  *
  * Semantics mirror the HOF fold EXACTLY (asserted against it in
  * CorpusSelectionSpec, including the null-length edge):
  *
  *   - candidate bins = loads l with l + len <= capacity; the winner is
  *     the FULLEST such bin, ties to the LOWEST index (the composed
  *     `array_max(transform(loads, struct(l, -(i0+1))))` order);
  *   - no candidate (or len > capacity) opens a new bin holding `len`;
  *   - a NULL length opens a new bin with a NULL load (the composed
  *     `when` yields all-null candidates and `concat(loads, array(len))`
  *     appends the null); a null-load bin never accepts a later doc
  *     (null comparisons are skipped by array_max);
  *   - emitted bin ids are 1-based ints (`coalesce(idx, size+1)`).
  *
  * Input: array<bigint> of lengths in placement order. Output:
  * struct<loads: array<bigint>, bins: array<int>>.
  */
final case class BestFitPack(child: Expression, capacity: Long) extends UnaryExpression {

  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def dataType: DataType = BestFitPack.outType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"best_fit_pack expects array<bigint>, got $t")
  }

  override protected def nullSafeEval(input: Any): Any =
    BestFitPack.pack(input.asInstanceOf[ArrayData], capacity)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.BestFitPack.pack($c, ${capacity}L)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def prettyName: String = "best_fit_pack"
}

object BestFitPack {

  val outType: StructType = StructType(Seq(
    StructField("loads", ArrayType(LongType, containsNull = true)),
    StructField("bins", ArrayType(IntegerType, containsNull = false))))

  /** Static entry the generated code calls (the static-forwarder naming
    * discipline of [[DotProduct.compute]]).
    */
  def pack(lens: ArrayData, capacity: Long): InternalRow = {
    val n = lens.numElements()
    // boxed loads: a null slot is a bin opened by a null length (the
    // composed fold's concat of a null element) — it never fits anyone
    val loads = new java.util.ArrayList[java.lang.Long](16)
    val bins = new Array[Int](n)
    var i = 0
    while (i < n) {
      var best = -1
      var bestLoad = Long.MinValue
      if (!lens.isNullAt(i)) {
        val len = lens.getLong(i)
        var j = 0
        val nb = loads.size()
        while (j < nb) {
          val l = loads.get(j)
          // strictly-greater keeps the FIRST max = lowest index on ties,
          // matching array_max over struct(l, -(i0+1))
          if (l != null && l.longValue() + len <= capacity && l.longValue() > bestLoad) {
            best = j
            bestLoad = l.longValue()
          }
          j += 1
        }
        if (best >= 0) loads.set(best, java.lang.Long.valueOf(bestLoad + len))
        else loads.add(java.lang.Long.valueOf(len))
      } else {
        loads.add(null)
      }
      bins(i) = if (best >= 0) best + 1 else loads.size()
      i += 1
    }
    val loadsArr = new Array[Any](loads.size())
    var j = 0
    while (j < loadsArr.length) { loadsArr(j) = loads.get(j); j += 1 }
    val binsArr = new Array[Any](n)
    i = 0
    while (i < n) { binsArr(i) = bins(i); i += 1 }
    new GenericInternalRow(Array[Any](
      new GenericArrayData(loadsArr), new GenericArrayData(binsArr)))
  }

  val info: ExpressionInfo = new ExpressionInfo(classOf[BestFitPack].getName, "best_fit_pack")
}
