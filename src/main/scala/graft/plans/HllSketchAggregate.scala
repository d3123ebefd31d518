package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** HyperLogLog register sketch (Flajolet et al. 2007) over a PORTABLE
  * hash coin — the constant-memory distinct counter that merges by
  * elementwise max, next to the order-statistic [[KmvMinK]].
  *
  * [[KmvMinK]]'s Scaladoc argues KMV-over-HLL on replayability grounds:
  * Spark's own `approx_count_distinct` registers are engine-private
  * (xxHash64 layout), so no external oracle can reproduce them. This
  * aggregate removes that objection instead of accepting it: the input
  * is the engine's md5-prefix coin (56 bits, `[0, 2^56)`), the register
  * index is the coin's TOP `p` bits and the register value is the rank
  * `rho = (56-p) + 1 - bitlen(low bits)` — both pure functions of the
  * coin, and `max` per register is order- and partitioning-independent.
  * The whole register vector is therefore replayable bit-for-bit by any
  * engine that can fold hex digits and count bits (the DuckDB oracle
  * does it with `bin()`/`length`, `Oracles.scala "sketch_hll"`).
  *
  * Why carry BOTH sketches: KMV estimates set sizes AND supports
  * pairwise intersection via min-k union ([[KmvMinK]] /
  * `sketch_overlap`); HLL's register state is 4x smaller per counted
  * bit of accuracy (m bytes vs k longs), merges by a branch-free
  * elementwise max — the natural shape for the per-source → corpus
  * rollup, where per-group sketches union WITHOUT rescanning the
  * corpus (`sketch_hll`'s merged row) — and is the layout every
  * warehouse interops on. State is `m = 2^p` bytes per group
  * regardless of cardinality; the partial aggregate combines map-side.
  *
  * Estimation stays OUT of the aggregate (mirror of
  * [[KmvMinK.estimate]]): the raw estimator `alpha_m * m^2 / sum(2^-M)`
  * is a column recipe over the returned registers where `sum(2^-M)` is
  * computed on an INTEGER grid — every term `2^(rmax - M)` is an exact
  * int64, so the only floating-point steps are one division and one
  * multiply, deterministic on any IEEE-754 engine.
  */
final case class HllRegisters(
    child: Expression,
    p: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]]
  with UnaryLike[Expression] {

  require(p >= 4 && p <= 16, s"hll_registers needs p in [4,16], got $p")

  private val m = 1 << p
  private val wBits = 56 - p
  private val wMask = (1L << wBits) - 1

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  override def update(buffer: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val coin = v.asInstanceOf[Long]
      val j = (coin >>> wBits).toInt & (m - 1)
      val w = coin & wMask
      // bitlen(w) = 64 - nlz(w); w == 0 gives rho = wBits + 1 (all
      // observable bits zero — the maximal rank), matching the oracle's
      // CASE WHEN w = 0 branch
      val rho = (wBits + 1 - (64 - java.lang.Long.numberOfLeadingZeros(w))).toByte
      if (rho > buffer(j)) buffer(j) = rho
    }
    buffer
  }

  override def merge(buffer: Array[Byte], other: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < m) {
      if (other(i) > buffer(i)) buffer(i) = other(i)
      i += 1
    }
    buffer
  }

  override def eval(buffer: Array[Byte]): Any = {
    val out = new Array[Int](m)
    var i = 0
    while (i < m) { out(i) = buffer(i).toInt; i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: Array[Byte]): Array[Byte] = buffer

  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllRegisters =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HllRegisters =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"hll_registers expects a bigint 56-bit coin column, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): HllRegisters =
    copy(child = newChild)

  override def prettyName: String = "hll_registers"
}

object HllRegisters {

  val info: ExpressionInfo = new ExpressionInfo(classOf[HllRegisters].getName, "hll_registers")

  /** `alpha_m` of the raw HLL estimator for `m = 2^p` registers. */
  def alpha(p: Int): Double = {
    val m = 1 << p
    m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
  }

  /** Integer-grid denominator `sum(2^-M)` scaled by `2^rmax` with
    * `rmax = (56-p) + 1` (the maximal register rank): each term
    * `2^(rmax - M)` is an exact int64 and the sum is
    * order-independent — this is the column the oracle reproduces and
    * the only input the float estimate needs.
    */
  def sumScaled(regs: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val rmax = (56 - p) + 1
    aggregate(regs, lit(0L),
      (acc, r) => acc + call_function("shiftleft", lit(1L), lit(rmax) - r))
  }

  /** Raw HLL estimate quantized to a 2^-10 grid:
    * `floor(alpha_m * m^2 * 2^rmax / s_scaled * 1024)`. One int64→double
    * cast, one divide, one multiply, one floor — bit-identical on any
    * IEEE engine, so the driver hash-compares it exactly.
    */
  def estimateQ10(sScaled: org.apache.spark.sql.Column, p: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val rmax = (56 - p) + 1
    val m = (1 << p).toDouble
    val c = alpha(p) * m * m * java.lang.Math.pow(2.0, rmax.toDouble)
    floor(lit(c) / sScaled.cast("double") * lit(1024.0)).cast("long")
  }
}
