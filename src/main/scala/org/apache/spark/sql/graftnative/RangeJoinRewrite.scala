package org.apache.spark.sql.graftnative

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{DoubleType, LongType, NumericType}

/** Optimizer rule: rewrite a pure-inequality interval join into the
  * banded equi-join of [[graft.operators.RangeJoin]] automatically.
  *
  * An inner join whose only condition is `lo <= v AND v < hi` (value
  * from one side, interval bounds from the other) plans as
  * BroadcastNestedLoopJoin — O(rows × intervals), unrunnable at 100 TB.
  * With this rule injected (and opt-in via
  * `spark.graft.rangeJoin.bucket = <width>`), the same SQL plans as:
  *
  *  - fact side gains `floor(v / bucket)` (one narrow column),
  *  - interval side explodes onto every bucket its `[lo, hi)` span
  *    touches (`Generate(Explode(Sequence(…)))`),
  *  - the join becomes an equi-join on the bucket key with the original
  *    inequality kept as residual condition — hash-joinable, AQE-
  *    planable, skew-splittable.
  *
  * This is the (c)-tier extension path of the brief: a
  * `Rule[LogicalPlan]` via `SparkSessionExtensions.injectOptimizerRule`,
  * used when composing DataFrame ops (tier a) can't help because the
  * query arrives as opaque SQL. The DataFrame-level
  * [[graft.operators.RangeJoin.bandJoin]] stays the explicit API; this
  * rule gives SQL users the identical plan shape transparently.
  *
  * Scope guards: inner joins only, no equi-conjunct already present
  * (those already hash-join), numeric value/bounds, both bounds from
  * the same (single) side. The rewrite preserves the join's output
  * attributes exactly (a final Project drops the helper columns).
  */
case class RangeJoinRewrite(spark: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  val BucketConf = "spark.graft.rangeJoin.bucket"

  override def apply(plan: LogicalPlan): LogicalPlan =
    // parse defensively: an unparsable or non-positive value disables
    // the rule — it must never throw inside the optimizer (that would
    // fail every query in the session, joins or not)
    spark.conf.getOption(BucketConf)
      .flatMap(v => scala.util.Try(v.toDouble).toOption)
      .filter(_ > 0) match {
      case Some(bucket) =>
        plan.transformUp {
          case j @ Join(l, r, Inner, Some(cond), hint) =>
            rewrite(j, l, r, cond, hint, bucket).getOrElse(j)
        }
      case None => plan
    }

  /** a >= b, normalized from >= and <= spellings. */
  private object Ge {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case GreaterThanOrEqual(a, b) => Some((a, b))
      case LessThanOrEqual(b, a)    => Some((a, b))
      case _                        => None
    }
  }

  /** a < b, normalized from < and > spellings. */
  private object Lt {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case LessThan(a, b)    => Some((a, b))
      case GreaterThan(b, a) => Some((a, b))
      case _                 => None
    }
  }

  private def rewrite(j: Join, l: LogicalPlan, r: LogicalPlan,
      cond: Expression, hint: JoinHint, bucket: Double): Option[LogicalPlan] = {
    def fromLeft(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(l.outputSet)
    def fromRight(e: Expression) =
      e.references.nonEmpty && e.references.subsetOf(r.outputSet)
    def oneSide(e: Expression): Option[Boolean] = // Some(true) = left
      if (fromLeft(e)) Some(true) else if (fromRight(e)) Some(false) else None

    val conjuncts = splitConjunctivePredicates(cond)
    // an existing cross-side equality means ExtractEquiJoinKeys already
    // hash-joins this; don't touch it
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b)       => oneSide(a).isDefined && oneSide(b).isDefined &&
        oneSide(a) != oneSide(b)
      case EqualNullSafe(a, b) => oneSide(a).isDefined && oneSide(b).isDefined &&
        oneSide(a) != oneSide(b)
      case _                   => false
    }
    if (hasEqui) return None

    // find v >= lo and v < hi with the SAME v, v and bounds on opposite
    // sides, everything numeric
    val lower = conjuncts.collect {
      case Ge(v, lo) if v.dataType.isInstanceOf[NumericType] &&
        lo.dataType.isInstanceOf[NumericType] &&
        oneSide(v).isDefined && oneSide(lo).isDefined &&
        oneSide(v) != oneSide(lo) => (v, lo)
    }
    val upper = conjuncts.collect {
      case Lt(v, hi) if v.dataType.isInstanceOf[NumericType] &&
        hi.dataType.isInstanceOf[NumericType] &&
        oneSide(v).isDefined && oneSide(hi).isDefined &&
        oneSide(v) != oneSide(hi) => (v, hi)
    }
    val pair = (for {
      (v1, lo) <- lower
      (v2, hi) <- upper
      if v1.semanticEquals(v2) && oneSide(lo) == oneSide(hi)
    } yield (v1, lo, hi)).headOption
    pair.flatMap { case (v, lo, hi) =>
      val vOnLeft = fromLeft(v)
      val (factPlan, bandPlan) = if (vOnLeft) (l, r) else (r, l)
      val b = Literal(bucket)
      def bucketOf(e: Expression): Expression =
        Floor(Divide(Cast(e, DoubleType), b)) // Floor(double) is LongType
      // fact side: one extra narrow column
      val factBucket = Alias(bucketOf(v), "__rjb_v")()
      val factProj = Project(factPlan.output :+ factBucket, factPlan)
      // interval side: explode onto the spanned buckets. The inclusive
      // upper bucket is Floor(hi / b) with NO epsilon adjustment: when
      // hi lands exactly on a boundary (hi exclusive) this generates one
      // bucket the interval can't actually match, but the original
      // inequality rides along as residual condition and filters those
      // rows — a spurious candidate bucket costs a few probes, whereas
      // an epsilon that rounds hi BELOW a boundary it sits just above
      // would drop the topmost bucket and silently lose matches (an
      // optimizer rule must be semantics-preserving; candidate
      // generation must over-approximate, never under-approximate).
      // Monotone casts keep bucket(v) within [bucket(lo), bucket(hi)]
      // even under double rounding of wide Long/Decimal values.
      // Sequence is TimeZoneAwareExpression: it stays UNRESOLVED until a
      // timezone is bound, even for numeric bounds
      val seq = Sequence(bucketOf(lo), bucketOf(hi), None,
        Some(conf.sessionLocalTimeZone))
      val bandAttr = AttributeReference("__rjb_b", LongType, nullable = false)()
      val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
        outer = false, qualifier = None, generatorOutput = Seq(bandAttr),
        child = bandPlan)
      val (newL, newR) = if (vOnLeft) (factProj, gen) else (gen, factProj)
      val newCond = And(EqualTo(factBucket.toAttribute, bandAttr), cond)
      Some(Project(j.output, Join(newL, newR, Inner, Some(newCond), hint)))
    }
  }
}
