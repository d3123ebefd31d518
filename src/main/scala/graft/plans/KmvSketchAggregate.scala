package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** KMV (k-minimum-values) distinct-count sketch — the bounded-memory
  * answer to `COUNT(DISTINCT x)` at corpus scale: keep only the `k`
  * SMALLEST distinct hash values ever seen; if the k-th smallest of a
  * uniform hash is `h_k ∈ (0,1]`, the stream held ≈ `(k-1)/h_k`
  * distinct values (Bar-Yossef et al. 2002, Beyer et al. 2007 — the
  * unbiased KMV estimator). An exact `countDistinct` shuffles the
  * whole value universe (vocabulary-sized exchange, same posture as
  * [[graft.operators.TextAnalysis.topTerms]]); this aggregate's state
  * is `k` longs per group regardless of cardinality, the partial
  * aggregate combines map-side, and the merge (union + trim to the k
  * smallest) is exactly the mergeable-summaries contract — the same
  * reason Spark ships HyperLogLog++ for `approx_count_distinct`. KMV
  * over HLL here because its output is REPLAYABLE: min-k of a set is
  * order- and partitioning-independent, so the driver's DuckDB oracle
  * reproduces the sketch bit-for-bit from the same hash coins
  * (`Oracles.scala "sketch_distinct"`), where HLL's register layout is
  * engine-private.
  *
  * Input is the already-hashed coin (a long; callers use the engine's
  * portable md5-prefix coin, [[graft.operators.CorpusSelection]]'s
  * discipline) — hashing stays in codegen'd expression space and the
  * aggregate is a pure order statistic. Duplicate coins collapse in
  * the buffer (a sorted SET), which is what makes the estimator a
  * DISTINCT counter: re-observing a value cannot move the k-th
  * minimum. Returns the ascending array of the ≤ k retained values;
  * [[KmvMinK.estimate]] turns it into the cardinality estimate.
  *
  * Suite-pinned properties ([[graft.plans.KmvSketchSpec]]): equals the
  * min-k of the exact distinct coin set, invariant under
  * repartitioning, and the k=256 estimate lands within the ~1/sqrt(k)
  * relative-error envelope on a 20k-value stream.
  */
final case class KmvMinK(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {

  require(k >= 2, s"kmv_min_k needs k >= 2 (the estimator divides by k-1), got $k")

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) add(buffer, v.asInstanceOf[Long])
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  private def add(buffer: java.util.TreeSet[java.lang.Long], v: Long): Unit = {
    // reject early: a value above the current k-th minimum can never
    // enter a full buffer, so the steady-state per-row cost is one
    // comparison, not a TreeSet insert+evict
    if (buffer.size() >= k) {
      if (v >= buffer.last()) return
      buffer.add(v)
      if (buffer.size() > k) buffer.pollLast()
    } else {
      buffer.add(v)
    }
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val arr = new Array[Long](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) { arr(i) = it.next(); i += 1 }
    new GenericArrayData(arr) // ascending — TreeSet iteration order
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.size() * 8)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) out.writeLong(it.next())
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { buf.add(in.readLong()); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMinK =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): KmvMinK =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(s"kmv_min_k expects a bigint hash column, got $t")
  }

  override protected def withNewChildInternal(newChild: Expression): KmvMinK =
    copy(child = newChild)

  override def prettyName: String = "kmv_min_k"
}

object KmvMinK {

  val info: ExpressionInfo = new ExpressionInfo(classOf[KmvMinK].getName, "kmv_min_k")

  /** Cardinality estimate from the retained min-k array, as a Column
    * recipe over coins drawn from `[0, coinSpace)`: exact (= set size)
    * while the buffer never filled, else the unbiased
    * `(k-1) / h_k` with `h_k = (kth + 1) / coinSpace` — the `+1` maps
    * the integer coin to a fraction in `(0, 1]` so a zero coin cannot
    * divide by zero. `coinSpace` MUST be a power of two (the md5
    * 6-hex-digit coin space is 2^24): dividing by a power of two is
    * EXACT in binary floating point, which is what lets the DuckDB
    * oracle reproduce the estimate bit-for-bit rather than to within
    * rounding.
    */
  def estimate(mink: org.apache.spark.sql.Column, k: Int, coinSpace: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    when(size(mink) < k, size(mink).cast("double"))
      .otherwise(lit((k - 1).toDouble) /
        ((element_at(mink, k).cast("double") + lit(1.0)) / lit(coinSpace)))
  }
}
