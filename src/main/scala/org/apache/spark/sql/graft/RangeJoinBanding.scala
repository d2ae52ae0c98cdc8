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
  *  - bounds of the general form `a + lo ⩽ b ⩽ a + hi` with literal
  *    day-time interval offsets (a bare `b >= a` is offset zero), any
  *    comparison orientation, strict or non-strict, hi > lo — this
  *    covers both the attribution window `b ∈ [a, a+w)` and the
  *    symmetric correlation window `|b − a| <= w` (which analyzes to
  *    offsets −w and +w).
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

  /** One side of a bound: `b` compared against `a + off` (micros).
    * `start` is the already-resolved expression for `a + off` — reused
    * verbatim from the condition so time-zone resolution carries over. */
  private case class Bound(
      a: AttributeReference, b: AttributeReference, off: Long, start: Expression)

  /** Interpret an expression as `a + INTERVAL off` (off = 0 for a bare
    * timestamp attribute). */
  private def tsAdd(e: Expression): Option[(AttributeReference, Long, Expression)] =
    e match {
      case t @ TimestampAddInterval(
          a: AttributeReference, Literal(w: Long, _: DayTimeIntervalType), _) =>
        Some((a, w, t))
      case a: AttributeReference if isTs(a) => Some((a, 0L, a))
      case _ => None
    }

  /** All bound readings of one comparison conjunct, as (bound, isUpper).
    * A comparison of two bare attributes is ambiguous (either side can
    * be the interval start) — both readings are returned and the pair
    * search keeps whichever combination is consistent. */
  private def bounds(e: Expression): Seq[(Bound, Boolean)] = e match {
    case GreaterThanOrEqual(x, y) => interp(x, y)
    case GreaterThan(x, y) => interp(x, y)
    case LessThanOrEqual(x, y) => interp(y, x)
    case LessThan(x, y) => interp(y, x)
    case _ => Nil
  }

  /** Readings of `big >= small` (strictness is irrelevant to banding —
    * the exact predicate stays in the join condition). */
  private def interp(big: Expression, small: Expression): Seq[(Bound, Boolean)] = {
    val lower = big match {
      case b: AttributeReference if isTs(b) =>
        tsAdd(small).map { case (a, off, s) => (Bound(a, b, off, s), false) }
      case _ => None
    }
    val upper = small match {
      case b: AttributeReference if isTs(b) =>
        tsAdd(big).map { case (a, off, s) => (Bound(a, b, off, s), true) }
      case _ => None
    }
    lower.toSeq ++ upper.toSeq
  }

  /** Epoch seconds of a timestamp expression. TIMESTAMP casts straight
    * to LONG; TIMESTAMP_NTZ cannot (`Cast.canCast` forbids NTZ→numeric),
    * so it hops through an instant cast pinned to UTC — a supported,
    * difference-preserving mapping (UTC has no DST, so naive-time
    * differences equal instant differences and the two-band identity
    * carries over exactly). The explicit zone id keeps the Cast resolved
    * post-analysis and independent of the session time zone.
    */
  private def epochSec(ts: Expression): Expression = ts.dataType match {
    case TimestampNTZType =>
      Cast(Cast(ts, TimestampType, Some("UTC")), LongType)
    case _ => Cast(ts, LongType)
  }

  private def bandOf(ts: Expression, bandSec: Long): Expression =
    IntegralDivide(
      Add(epochSec(ts), Literal(EpochShiftSec)),
      Literal(bandSec))

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if !cond.references.exists(_.name.startsWith(BandPrefix)) =>
      val all = splitConjunctivePredicates(cond).flatMap(bounds)
      val lowers = all.collect { case (bd, false) => bd }
      val uppers = all.collect { case (bd, true) => bd }
      val rewritten = (for {
        lo <- lowers.iterator
        hi <- uppers.iterator
        if lo.a.semanticEquals(hi.a) && lo.b.semanticEquals(hi.b) &&
          hi.off > lo.off && // a + lo <= b <= a + hi with positive width
          isTs(lo.a) && isTs(lo.b) && lo.a.dataType == lo.b.dataType &&
          ((left.outputSet.contains(lo.a) && right.outputSet.contains(lo.b)) ||
            (right.outputSet.contains(lo.a) && left.outputSet.contains(lo.b)))
      } yield {
        val wUs = hi.off - lo.off
        val bandSec = (wUs + 999999L) / 1000000L // ceil to whole seconds
        val aOnLeft = left.outputSet.contains(lo.a)
        val (aSide, bSide) = if (aOnLeft) (left, right) else (right, left)

        // Interval-start side: band the LOWER bound expression (a + lo)
        // and replicate into its own and the next band.
        val base = bandOf(lo.start, bandSec)
        val bandA = AttributeReference(s"${BandPrefix}_a", LongType)()
        val replicated = Generate(
          Explode(CreateArray(Seq(base, Add(base, Literal(1L))))),
          unrequiredChildIndex = Nil, outer = false, qualifier = None,
          generatorOutput = Seq(bandA), child = aSide)

        // Bounded side: a single band value.
        val bandB = Alias(bandOf(lo.b, bandSec), s"${BandPrefix}_b")()
        val projected = Project(bSide.output :+ bandB, bSide)

        val (newLeft, newRight) =
          if (aOnLeft) (replicated, projected) else (projected, replicated)
        val newCond = And(cond, EqualTo(bandA, bandB.toAttribute))
        // Restore the original output (the band columns are internal).
        Project(j.output, Join(newLeft, newRight, Inner, Some(newCond), hint))
      }).nextOption()
      rewritten.getOrElse(j)
  }
}
