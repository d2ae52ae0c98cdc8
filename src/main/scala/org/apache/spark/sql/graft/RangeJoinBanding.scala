package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Generate, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DayTimeIntervalType, LongType, TimestampNTZType, TimestampType}

/** Optimizer rule: rewrite a timestamp *range join* into a banded
  * equi-join so it never plans as a nested-loop.
  *
  * A join whose only (or residual) time condition is
  * {{{ b.ts >= a.ts AND b.ts < a.ts + INTERVAL w }}}
  * is planned by Spark as BroadcastNestedLoopJoin when no equality
  * conjunct exists (O(|A|·|B|) comparisons, build side fully broadcast
  * — the classic 100 TB cliff), or as a hash join on the equality keys
  * alone with the range evaluated post-hoc (per-key cross product).
  * This rule applies the banding identity used manually by
  * `graft.operators.Events.intervalJoin`: with band width ≥ the window,
  * {{{ band(b) ∈ { band(a), band(a) + 1 } }}}
  * for every qualifying pair, so replicating the interval-start side
  * into its own and the next band and joining on band equality (plus
  * any pre-existing keys) turns the range join into a plain equi-join —
  * hash-partitioned, AQE-eligible — while the original predicate stays
  * in the condition to prune band false positives exactly.
  *
  * Scope (deliberately conservative):
  *  - Inner joins only, both bound conjuncts over plain timestamp
  *    attributes of the same type (TIMESTAMP or TIMESTAMP_NTZ), one
  *    from each side;
  *  - upper bound `b < a + INTERVAL w` / `b <= a + INTERVAL w` (and
  *    mirrored orientations) with a positive literal day-time interval;
  *  - lower bound `b >= a` / `b > a` (and mirrored orientations).
  *
  * Band width is the window rounded UP to whole seconds, so sub-second
  * windows stay correct (wider bands only add false positives, which
  * the exact predicate removes). Seconds are shifted by the year-0
  * epoch offset before the integral divide: `div` truncates toward
  * zero, which is floor only for non-negative values — without the
  * shift, pre-1970 timestamps would band incorrectly.
  */
object RangeJoinBanding extends Rule[LogicalPlan] with PredicateHelper {

  /** Seconds from 0000-01-01 to 1970-01-01: makes any representable
    * timestamp's shifted epoch-seconds non-negative, so truncating
    * division equals floor division. */
  private val EpochShiftSec = 62167219200L

  private val BandPrefix = "__graft_band"

  private def isTs(e: Expression): Boolean =
    e.dataType == TimestampType || e.dataType == TimestampNTZType

  /** (intervalStart a, boundedSide b, window micros) from an upper-bound
    * conjunct shaped like b < a + INTERVAL w (any orientation). */
  private def asUpper(e: Expression)
      : Option[(AttributeReference, AttributeReference, Long)] = e match {
    case LessThan(b: AttributeReference,
        TimestampAddInterval(a: AttributeReference, Literal(w: Long, _: DayTimeIntervalType), _)) =>
      Some((a, b, w))
    case LessThanOrEqual(b: AttributeReference,
        TimestampAddInterval(a: AttributeReference, Literal(w: Long, _: DayTimeIntervalType), _)) =>
      Some((a, b, w))
    case GreaterThan(
        TimestampAddInterval(a: AttributeReference, Literal(w: Long, _: DayTimeIntervalType), _),
        b: AttributeReference) =>
      Some((a, b, w))
    case GreaterThanOrEqual(
        TimestampAddInterval(a: AttributeReference, Literal(w: Long, _: DayTimeIntervalType), _),
        b: AttributeReference) =>
      Some((a, b, w))
    case _ => None
  }

  /** True if the conjunct is a lower bound b >= a (any orientation). */
  private def isLower(e: Expression, a: Attribute, b: Attribute): Boolean = e match {
    case GreaterThanOrEqual(x: AttributeReference, y: AttributeReference) =>
      x.semanticEquals(b) && y.semanticEquals(a)
    case GreaterThan(x: AttributeReference, y: AttributeReference) =>
      x.semanticEquals(b) && y.semanticEquals(a)
    case LessThanOrEqual(y: AttributeReference, x: AttributeReference) =>
      x.semanticEquals(b) && y.semanticEquals(a)
    case LessThan(y: AttributeReference, x: AttributeReference) =>
      x.semanticEquals(b) && y.semanticEquals(a)
    case _ => false
  }

  private def bandOf(ts: Expression, bandSec: Long): Expression =
    IntegralDivide(
      Add(Cast(ts, LongType), Literal(EpochShiftSec)),
      Literal(bandSec))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BandPrefix)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val rewritten = conjuncts.iterator.flatMap(asUpper).collectFirst {
        case (a, b, wUs)
            if wUs > 0 && isTs(a) && isTs(b) && a.dataType == b.dataType &&
              conjuncts.exists(isLower(_, a, b)) &&
              ((left.outputSet.contains(a) && right.outputSet.contains(b)) ||
                (right.outputSet.contains(a) && left.outputSet.contains(b))) =>
          val bandSec = (wUs + 999999L) / 1000000L // ceil to whole seconds
          val aOnLeft = left.outputSet.contains(a)
          val (aSide, bSide) = if (aOnLeft) (left, right) else (right, left)

          // Interval-start side: replicate into its own and the next band.
          val base = bandOf(a, bandSec)
          val bandA = AttributeReference(s"${BandPrefix}_a", LongType)()
          val replicated = Generate(
            Explode(CreateArray(Seq(base, Add(base, Literal(1L))))),
            unrequiredChildIndex = Nil, outer = false, qualifier = None,
            generatorOutput = Seq(bandA), child = aSide)

          // Bounded side: a single band value.
          val bandB = Alias(bandOf(b, bandSec), s"${BandPrefix}_b")()
          val projected = Project(bSide.output :+ bandB, bSide)

          val (newLeft, newRight) =
            if (aOnLeft) (replicated, projected) else (projected, replicated)
          val newCond = And(cond, EqualTo(bandA, bandB.toAttribute))
          // Restore the original output (the band columns are internal).
          Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      }
      rewritten.getOrElse(j)
  }
}
