package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join — the library's whole-operator Catalyst extension
  * (the (c) tier: custom `LogicalPlan` + `SparkStrategy` + `SparkPlan`),
  * complementing the composed union+window form in
  * [[graft.operators.AsOfJoin]] (reference semantics:
  * `merge_asof`/ASOF JOIN — latest right row with `right.ts <= left.ts`
  * per key).
  *
  * Why a physical operator when the composed form already works: the
  * merge join does ONE pass over each sorted side with O(1) state (the
  * last-seen right row), where the window form materializes the unioned
  * stream and runs `last(_, ignoreNulls)` over it — same shuffle
  * budget (one exchange + sort per side either way, enforced here
  * declaratively via `requiredChildDistribution` /
  * `requiredChildOrdering`, so Catalyst plans the exchanges and can
  * elide them when the inputs are already bucketed+sorted), but the
  * probe phase allocates nothing per row and never widens rows with
  * null payload carriers.
  *
  * Semantics match [[graft.operators.AsOfJoin.asOf]] and DuckDB's
  * native ASOF LEFT JOIN (the oracle): inclusive `<=`; a null-ts or
  * null-key left row gets a null payload; null-ts/null-key right rows
  * match nothing. Ties on equal (key, ts) right rows resolve to the
  * last row in partition-sort order — unspecified among exact
  * duplicates (the composed form's xxhash64 tiebreak is the documented
  * answer when payload-duplicate timestamps are possible).
  *
  * Key and both timestamps must evaluate to 8-byte comparables
  * (LongType / TimestampType); the API wrapper
  * [[graft.operators.AsOfJoin.asOfNative]] casts and renames.
  */
case class AsOfJoinNode(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

/** Plans [[AsOfJoinNode]] to [[AsOfMergeJoinExec]]. Registered at
  * runtime via `spark.experimental.extraStrategies` (the public
  * post-hoc twin of `SparkSessionExtensions.injectPlannerStrategy`).
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case n: AsOfJoinNode =>
      AsOfMergeJoinExec(n.leftKey, n.rightKey, n.leftTs, n.rightTs,
        planLater(n.left), planLater(n.right)) :: Nil
    case _ => Nil
  }
}

/** Sorted per-partition merge: both children hash-clustered on the key
  * (EnsureRequirements co-partitions them exactly as it does for a
  * sort-merge join) and sorted by (key, ts); the probe keeps the single
  * latest matching right row and emits left ⧟ (match | nulls).
  */
case class AsOfMergeJoinExec(
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override def outputOrdering: Seq[SortOrder] =
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfMergeJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lkB = BindReferences.bindReference(leftKey, left.output)
    val ltB = BindReferences.bindReference(leftTs, left.output)
    val rkB = BindReferences.bindReference(rightKey, right.output)
    val rtB = BindReferences.bindReference(rightTs, right.output)
    val rightWidth = right.output.size
    // bind the projection against the NULLABLE view of the right side —
    // binding against right.output directly would codegen null-check-free
    // field reads and turn the no-match null row into zeros
    val outAttrs = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightWidth)
      val rBuf = rIter.buffered
      var lastMatch: InternalRow = null
      var lastMatchKey = 0L
      var lastMatchValid = false
      lIter.map { l =>
        val lkv = lkB.eval(l)
        val ltv = ltB.eval(l)
        if (lkv == null || ltv == null) {
          proj(joined(l, nullRight))
        } else {
          val lKey = lkv.asInstanceOf[Long]
          val lTs = ltv.asInstanceOf[Long]
          var done = false
          while (!done && rBuf.hasNext) {
            val r = rBuf.head
            val rkv = rkB.eval(r)
            val rtv = rtB.eval(r)
            if (rkv == null || rtv == null) {
              rBuf.next() // unmatched by contract: consume and drop
            } else {
              val rKey = rkv.asInstanceOf[Long]
              val rTs = rtv.asInstanceOf[Long]
              if (rKey < lKey) {
                rBuf.next() // history for an earlier key: skip
              } else if (rKey == lKey && rTs <= lTs) {
                lastMatch = rBuf.next().copy() // newest so far for this key
                lastMatchKey = rKey
                lastMatchValid = true
              } else {
                done = true // first right row beyond (key, ts): stop
              }
            }
          }
          if (lastMatchValid && lastMatchKey == lKey) proj(joined(l, lastMatch))
          else proj(joined(l, nullRight))
        }
      }
    }
  }
}
