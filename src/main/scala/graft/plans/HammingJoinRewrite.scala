package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Catalyst optimizer rule: rewrite the NATURAL Hamming-distance join
  *
  * {{{ a JOIN b ON bit_count(a.sim ^ b.sim) <= k }}}
  *
  * — which vanilla Spark can only plan as a (Broadcast)NestedLoopJoin,
  * a full cross product at any scale — into the engine's PIGEONHOLE
  * banded equi-join (the q61 plan, surfaced for SQL users; the
  * similarity sibling of [[SpatialJoinRewrite]]/[[IntervalJoinRewrite]]):
  * both sides explode to `bands` (band, 16-bit-key) rows, hash-join on
  * (band, key), and the ORIGINAL popcount predicate refines exactly.
  *
  * Correctness:
  *  - completeness: with `bands` > k disjoint bands, ≤ k differing bits
  *    cannot touch every band, so every qualifying pair agrees on at
  *    least one whole band — candidate generation is a superset;
  *  - multiplicity: a pair agreeing on several bands would duplicate,
  *    so the join keeps only the MINIMAL agreeing band via the unrolled
  *    row-local filter AND_{b'<band}(key_b'(l) ≠ key_b'(r)) — each
  *    qualifying (l, r) combination survives in exactly one band row
  *    pair, preserving Inner multiplicity without a Distinct. INNER
  *    only: under Semi/Anti the preserved side is exploded, and a left
  *    row matching different right rows in different minimal bands (or
  *    matching none, for Anti) would emit per-band copies.
  *
  * `bands` is the smallest power-of-two divisor of the fingerprint
  * width exceeding k (k ≤ 3 → 4×16 bits, the q61 configuration; larger
  * k degrades gracefully to narrower bands). 64-bit (LongType)
  * fingerprints only — the engine's standard; 32-bit keys cap the band
  * key space at 2⁸ (the round-6 q61 finding).
  */
object HammingJoinRewrite extends Rule[LogicalPlan] with PredicateHelper {

  private val HB = "__graft_hb"
  private val BITS = 64

  /** (leftSim, rightSim, k) when some conjunct is the popcount-of-xor
    * bound with one side's fingerprint on each join side. */
  private def hammingBound(conjuncts: Seq[Expression], left: LogicalPlan,
                           right: LogicalPlan): Option[(Expression, Expression, Int)] = {
    def kOf(e: Expression): Option[Int] = e match {
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) => Some(v.toInt)
      case _ => None
    }
    def sides(x: Expression, y: Expression): Option[(Expression, Expression)] =
      if (x.references.nonEmpty && x.references.subsetOf(left.outputSet) &&
          y.references.nonEmpty && y.references.subsetOf(right.outputSet))
        Some((x, y))
      else if (x.references.nonEmpty && x.references.subsetOf(right.outputSet) &&
          y.references.nonEmpty && y.references.subsetOf(left.outputSet))
        Some((y, x))
      else None
    conjuncts.iterator.flatMap {
      case LessThanOrEqual(BitwiseCount(BitwiseXor(x, y)), kl) =>
        for (k <- kOf(kl); (l, r) <- sides(x, y)) yield (l, r, k)
      case GreaterThanOrEqual(kl, BitwiseCount(BitwiseXor(x, y))) =>
        for (k <- kOf(kl); (l, r) <- sides(x, y)) yield (l, r, k)
      case LessThan(BitwiseCount(BitwiseXor(x, y)), kl) =>
        for (k <- kOf(kl); (l, r) <- sides(x, y)) yield (l, r, k - 1)
      case GreaterThan(kl, BitwiseCount(BitwiseXor(x, y))) =>
        for (k <- kOf(kl); (l, r) <- sides(x, y)) yield (l, r, k - 1)
      case _ => None
    }.collectFirst { case t if t._1.dataType == LongType &&
      t._2.dataType == LongType && t._3 >= 0 && t._3 < BITS => t }
  }

  private def bandKey(sim: Expression, band: Int, w: Int): Expression =
    BitwiseAnd(ShiftRight(sim, Literal(band * w)), Literal((1L << w) - 1))

  /** Explode `side` to one row per band with its 16-bit key. */
  private def banded(side: LogicalPlan, sim: Expression, bands: Int, w: Int)
  : (LogicalPlan, Attribute, Attribute) = {
    val bandAttr = AttributeReference(HB + "_b", IntegerType, nullable = false)()
    val gen = Generate(
      Explode(CreateArray((0 until bands).map(b => Literal(b)))),
      unrequiredChildIndex = Nil, outer = false, qualifier = None,
      generatorOutput = Seq(bandAttr), child = side)
    // key = (sim >> band*w) & mask, computed once in a Project so the
    // equi-key extractor sees a bare attribute on each side
    val keyAlias = Alias(
      CaseWhen((0 until bands).map(b =>
        (EqualTo(bandAttr, Literal(b)), bandKey(sim, b, w))), None), HB + "_k")()
    val proj = Project(gen.output :+ keyAlias, gen)
    (proj, bandAttr, keyAlias.toAttribute)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(left, right, Inner, Some(cond), hint)
        if j.resolved &&
          !left.output.exists(_.name.startsWith(HB)) &&
          !right.output.exists(_.name.startsWith(HB)) =>
      val conjuncts = splitConjunctivePredicates(cond)
      val hasEquiKey = conjuncts.exists {
        case EqualTo(a, b) =>
          (a.references.nonEmpty && a.references.subsetOf(left.outputSet) &&
            b.references.nonEmpty && b.references.subsetOf(right.outputSet)) ||
          (a.references.nonEmpty && a.references.subsetOf(right.outputSet) &&
            b.references.nonEmpty && b.references.subsetOf(left.outputSet))
        case _ => false
      }
      if (hasEquiKey) j
      else hammingBound(conjuncts, left, right) match {
        case None => j
        case Some((ls, rs, k)) =>
          val bands = Seq(2, 4, 8, 16, 32, 64).find(_ > k).get
          val w = BITS / bands
          val (lp, lb, lk) = banded(left, ls, bands, w)
          val (rp, rb, rk) = banded(right, rs, bands, w)
          // minimal-band filter: no EARLIER band key also agrees — each
          // qualifying pair survives in exactly one band row pair
          val minimality = (0 until bands - 1).map { b =>
            Or(LessThanOrEqual(lb, Literal(b)),
              Not(EqualTo(bandKey(ls, b, w), bandKey(rs, b, w))))
          }.reduceLeft(And)
          val newCond = Seq(EqualTo(lb, rb), EqualTo(lk, rk), minimality, cond)
            .reduceLeft(And)
          Project(j.output, Join(lp, rp, Inner, Some(newCond), hint))
      }
  }
}
