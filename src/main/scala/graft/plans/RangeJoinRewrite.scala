package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DateType, DoubleType, LongType}

/** Optimizer rule: rewrite a pure date-range join into a bucket-expansion
  * equi-join.
  *
  * A join whose ONLY condition is interval containment —
  * `probe BETWEEN lo AND hi` with `probe` from one side and `lo`/`hi`
  * from the other — has no equi-join keys, so Spark plans it as
  * BroadcastNestedLoopJoin (or CartesianProduct beyond the broadcast
  * threshold): every probe row is tested against EVERY interval,
  * O(rows × intervals). [[graft.ops.RangeJoin]] documents the manual
  * rewrite; this rule performs the same rewrite automatically on the
  * logical plan, so a user writing the naive predicate through
  * `spark.sql` or the DataFrame API gets the scale-safe plan:
  *
  *  - interval side gains `explode(sequence(wk(lo), wk(hi)))` — one row
  *    per overlapped calendar week, bounded by interval length;
  *  - probe side gains the scalar `wk(probe)`;
  *  - the join becomes `wk = wk AND <original condition>` — a hash
  *    equi-join on the week id with containment as a residual filter
  *    (week overlap ⊇ containment, so no rows are lost).
  *
  * Fires only when: inner join, every conjunct is either the range pair
  * or a one-sided filter, no existing equi-conjunct (if there is one,
  * Spark already hash-joins and the rewrite would only add work), and
  * the three range expressions are DateType and deterministic. The
  * rewritten join HAS an equi-conjunct, which makes the rule idempotent
  * under the optimizer's fixed-point batch.
  *
  * Registered via [[GraftExtensions]] (`injectOptimizerRule`) — the
  * extension mechanism Spark provides exactly so an engine can add
  * optimizations Catalyst lacks without forking it.
  */
object RangeJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  /** Bucket width: one calendar week of days. Intervals expand to
    * length/7 + 1 rows; wider buckets mean fewer expansion rows but a
    * weaker pre-filter (more residual-filter work after the hash join). */
  val BucketDays = 7

  /** days-since-epoch(d) div 7, as the same `floor(datediff(d, epoch)/7)`
    * arithmetic the manual rewrite uses — LongType out. */
  private def weekOf(d: Expression): Expression =
    Floor(new Divide(
      Cast(DateDiff(d, Literal(0, DateType)), DoubleType),
      Literal(7.0)))

  private def sideOnly(e: Expression, p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet) &&
      e.deterministic

  /** The (probe, lo, hi) triple if `conjuncts` contains exactly one
    * lower and one upper bound on the same left-side date expression
    * against right-side date bounds. */
  private def rangePair(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Option[(Expression, Expression, Expression)] = {
    def asLower(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(p, lo) if sideOnly(p, left) && sideOnly(lo, right) => Some((p, lo))
      case LessThanOrEqual(lo, p) if sideOnly(p, left) && sideOnly(lo, right) => Some((p, lo))
      case _ => None
    }
    def asUpper(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThanOrEqual(p, hi) if sideOnly(p, left) && sideOnly(hi, right) => Some((p, hi))
      case GreaterThanOrEqual(hi, p) if sideOnly(p, left) && sideOnly(hi, right) => Some((p, hi))
      case _ => None
    }
    val lowers = conjuncts.flatMap(asLower(_))
    val uppers = conjuncts.flatMap(asUpper(_))
    (lowers, uppers) match {
      case (Seq((p1, lo)), Seq((p2, hi)))
        if p1.semanticEquals(p2) && p1.dataType == DateType &&
          lo.dataType == DateType && hi.dataType == DateType =>
        Some((p1, lo, hi))
      case _ => None
    }
  }

  private def hasEquiConjunct(conjuncts: Seq[Expression], left: LogicalPlan,
      right: LogicalPlan): Boolean = conjuncts.exists {
    case EqualTo(l, r) =>
      (sideOnly(l, left) && sideOnly(r, right)) ||
        (sideOnly(l, right) && sideOnly(r, left))
    case EqualNullSafe(l, r) =>
      (sideOnly(l, left) && sideOnly(r, right)) ||
        (sideOnly(l, right) && sideOnly(r, left))
    case _ => false
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, Inner, Some(cond), hint) =>
      val conjuncts = splitConjunctivePredicates(cond)
      if (hasEquiConjunct(conjuncts, left, right)) j
      else rangePair(conjuncts, left, right) match {
        case Some((probe, lo, hi)) =>
          // probe side: scalar week id, no row expansion
          val lWk = Alias(weekOf(probe), "__graft_wk_probe")()
          val leftProj = Project(left.output :+ lWk, left)
          // interval side: one row per overlapped week
          val rWkAttr = AttributeReference("__graft_wk_iv", LongType)()
          // Sequence is TimeZoneAwareExpression: it is unresolved until a
          // zone is attached, even for pure long bounds
          val seq = Sequence(weekOf(lo), weekOf(hi), Some(Literal(1L)),
            Some(conf.sessionLocalTimeZone))
          val rightGen = Generate(Explode(seq), unrequiredChildIndex = Nil,
            outer = false, qualifier = None,
            generatorOutput = Seq(rWkAttr), child = right)
          val newCond = And(EqualTo(lWk.toAttribute, rWkAttr), cond)
          Project(j.output,
            Join(leftProj, rightGen, Inner, Some(newCond), hint))
        case None => j
      }
  }
}
