package graft.plans

import java.io.{ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StructField, StructType}

/** Bounded-state top-k-per-group aggregate — the window-sort killer.
  *
  * The idiomatic "top k rows per group" plan (`row_number() OVER
  * (PARTITION BY g ORDER BY ord DESC)` then `rank <= k`) shuffles and
  * SORTS every input row: at corpus scale that is a full-data exchange
  * plus a per-partition sort, all to discard everything but k rows per
  * group. This aggregate keeps a k-entry ordered buffer per group
  * instead: the partial aggregate runs map-side (each task retains at
  * most k pairs per group it sees), the shuffle carries only those
  * bounded buffers, and the merge is a union-then-trim — the same
  * mergeable-summaries contract as [[KmvMinK]], applied to ranking
  * instead of cardinality. `max_by(struct)` (the A4 dedup kernel,
  * `operators/Dedup.latestByKey`) is the k = 1 special case; this is
  * the general k.
  *
  * Ordering is DESC by `ord`, ties broken ASC by `payload` — a total
  * order on (ord, payload) pairs, so the retained SET (and hence the
  * output) is independent of partitioning and arrival order; duplicate
  * (ord, payload) pairs collapse in the buffer (set semantics, the KMV
  * discipline). Callers encode their ranking as an int64 — typically a
  * fixed-point grid value (the engine's 2^20/2^40 house grids) — and
  * the payload as the row id; the driver row (`topk_per_group`)
  * verifies the whole kernel against DuckDB's window-function answer.
  *
  * Returns the pairs in rank order as `array<struct<ord, payload>>`;
  * callers `posexplode` for (rank, id) rows. State: ≤ k pairs per
  * group, regardless of group size.
  */
final case class TopKPairs(
    left: Expression,
    right: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[(Long, Long)]]
  with BinaryLike[Expression] {

  require(k >= 1, s"topk_pairs needs k >= 1, got $k")

  // DESC by ord, ties ASC by payload — the rank order and the buffer
  // order coincide, so eval is a straight copy-out
  private val ordering: Ordering[(Long, Long)] =
    Ordering.by[(Long, Long), (Long, Long)] { case (o, p) => (-o, p) }

  override def createAggregationBuffer(): java.util.TreeSet[(Long, Long)] =
    new java.util.TreeSet[(Long, Long)](ordering)

  override def update(
      buffer: java.util.TreeSet[(Long, Long)],
      input: InternalRow): java.util.TreeSet[(Long, Long)] = {
    val o = left.eval(input)
    val p = right.eval(input)
    if (o != null && p != null) add(buffer, (o.asInstanceOf[Long], p.asInstanceOf[Long]))
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[(Long, Long)],
      other: java.util.TreeSet[(Long, Long)]): java.util.TreeSet[(Long, Long)] = {
    val it = other.iterator()
    while (it.hasNext) add(buffer, it.next())
    buffer
  }

  private def add(buffer: java.util.TreeSet[(Long, Long)], v: (Long, Long)): Unit = {
    // steady state: one comparison rejects a row that cannot rank —
    // the KmvMinK early-reject discipline
    if (buffer.size() >= k) {
      if (ordering.compare(v, buffer.last()) >= 0) return
      buffer.add(v)
      if (buffer.size() > k) buffer.pollLast()
    } else {
      buffer.add(v)
    }
  }

  override def eval(buffer: java.util.TreeSet[(Long, Long)]): Any = {
    val arr = new Array[Any](buffer.size())
    val it = buffer.iterator()
    var i = 0
    while (it.hasNext) {
      val (o, p) = it.next()
      arr(i) = new GenericInternalRow(Array[Any](o, p))
      i += 1
    }
    new GenericArrayData(arr)
  }

  override def serialize(buffer: java.util.TreeSet[(Long, Long)]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(4 + buffer.size() * 16)
    val out = new DataOutputStream(bos)
    out.writeInt(buffer.size())
    val it = buffer.iterator()
    while (it.hasNext) { val (o, p) = it.next(); out.writeLong(o); out.writeLong(p) }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Long, Long)] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((in.readLong(), in.readLong())); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKPairs =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): TopKPairs =
    copy(inputAggBufferOffset = newOffset)

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("ord", LongType, nullable = false),
      StructField("payload", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"topk_pairs expects (bigint ord, bigint payload), got ($l, $r)")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKPairs =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "topk_pairs"
}

object TopKPairs {
  val info: ExpressionInfo = new ExpressionInfo(classOf[TopKPairs].getName, "topk_pairs")
}
