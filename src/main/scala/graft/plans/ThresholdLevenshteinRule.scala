package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.IntegerType

/** Optimizer rule: band-limit Levenshtein comparisons.
  *
  * A filter written naively as `levenshtein(a, b) <= k` evaluates the
  * FULL O(|a|·|b|) dynamic program on every candidate pair and then
  * throws most of the work away. Spark's thresholded form
  * `levenshtein(a, b, k)` runs a banded DP restricted to the 2k+1
  * diagonals and early-exits to −1 the moment the bound is exceeded —
  * O(min(|a|,|b|)·k) — but users (and generated SQL) keep writing the
  * comparison form. This rule rewrites the predicate shapes
  *
  *   levenshtein(a, b) <= k   →  levenshtein(a, b, k) != -1
  *   levenshtein(a, b) <  k   →  levenshtein(a, b, k-1) != -1  (k >= 1)
  *   levenshtein(a, b) =  k   →  levenshtein(a, b, k) = k
  *
  * (plus the mirrored literal-first forms) for non-negative integer
  * literals — exactly the rewrite a query author would do by hand in
  * [[graft.operators.Linkage.fuzzyNamePairs]], applied mechanically to
  * every plan in the session. Semantics are identical: the thresholded
  * form returns the true distance when it is ≤ k and −1 otherwise.
  *
  * The un-thresholded expression is left untouched when its value is
  * USED (projected, aggregated) rather than compared — the rule only
  * fires inside comparison predicates, so it can never change a
  * query's output, only its cost.
  */
object ThresholdLevenshteinRule extends Rule[LogicalPlan] {

  private def bounded(l: Expression, r: Expression, k: Int): Expression =
    Levenshtein(l, r, Some(Literal(k, IntegerType)))

  private def notExceeded(l: Expression, r: Expression, k: Int): Expression =
    Not(EqualTo(bounded(l, r, k), Literal(-1, IntegerType)))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // lev(a,b) <= k  /  k >= lev(a,b)
    case LessThanOrEqual(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      notExceeded(l, r, k)
    case GreaterThanOrEqual(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      notExceeded(l, r, k)
    // lev(a,b) < k  /  k > lev(a,b)
    case LessThan(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 1 =>
      notExceeded(l, r, k - 1)
    case GreaterThan(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 1 =>
      notExceeded(l, r, k - 1)
    // lev(a,b) = k: bound the DP at k, then demand exact equality
    case EqualTo(Levenshtein(l, r, None), Literal(k: Int, IntegerType)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(k, IntegerType))
    case EqualTo(Literal(k: Int, IntegerType), Levenshtein(l, r, None)) if k >= 0 =>
      EqualTo(bounded(l, r, k), Literal(k, IntegerType))
  }
}
