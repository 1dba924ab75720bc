package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed 1-D interval (time-range) join: points (id, t) × intervals
  * (rid, start, end) → (id, rid) where start ≤ t < end — the temporal
  * sibling of [[SpatialJoin.joinPointsInBoxes]], for event × window /
  * validity-period lookups at 100 TB.
  *
  * Same shape as every join in this family: a naive range predicate can
  * only plan as a nested loop, so points key to ONE time bucket
  * (floor(µs / 2^pow)) and intervals explode to their covering bucket
  * range — a plain hash equi-join that scales with data, refined by the
  * exact predicate (candidate generation is a pure superset step;
  * empty/inverted intervals are dropped before the explode — they match
  * nothing). Timestamps are compared at Spark/Parquet's native
  * microsecond precision, so `t < end` ⇔ `t ≤ end − 1 µs` and the
  * covering range ends at bucket(end − 1).
  *
  * The bucket width is POWER-OF-TWO µs, auto-derived from the interval
  * side's stats (median/2 bounded by max/64 — the [[SpatialJoin
  * .bitsFromExtents]] rationale in one dimension: ~3 buckets per median
  * interval, ≤ ~65 for the longest straggler) in one bounded agg job over
  * the SMALL interval side, memoized in the shared [[SpatialJoin
  * .BitsMemo]]. The chosen power is published to [[LAST_POW_KEY]]. */
object IntervalJoin {

  /** Sentinel: derive the bucket width from interval stats. */
  val AUTO_POW: Int = -1

  /** Observability: the last auto-chosen width power (2^pow µs). */
  val LAST_POW_KEY = "spark.graft.intervalJoin.lastWidthPow"

  /** Per-interval covering-bucket cap for PINNED widths (the auto path
    * bounds itself at ~65 via the max/64 stats rule). */
  val MAX_COVER: Long = 1L << 20

  /** log2 bucket width from median/max interval lengths in µs, clamped
    * [1, 62] (a 2 µs floor keeps degenerate intervals from demanding
    * unbounded resolution; 62 keeps the shift in Long range). */
  def widthPowForLens(medMicros: Double, maxMicros: Double): Int = {
    val target = math.max(2.0, math.max(medMicros / 2.0, maxMicros / 64.0))
    math.max(1, math.min(62, math.floor(math.log(target) / math.log(2.0)).toInt))
  }

  private def autoPow(intervals: DataFrame): Int =
    SpatialJoin.BitsMemo.getOrCompute(
      "iv|" + SpatialJoin.planKey(intervals.queryExecution.analyzed)) {
      val len = unix_micros(col("end").cast("timestamp")) -
        unix_micros(col("start").cast("timestamp"))
      val r = intervals.select(
        percentile_approx(len, lit(0.5), lit(100)).as("med"),
        max(len).as("mx")).head()
      if (r.isNullAt(0)) 20 // empty side: ~1 s buckets
      else widthPowForLens(r.getLong(0).toDouble, r.getLong(1).toDouble)
    }

  /** points: (id, t timestamp); intervals: (rid, start, end timestamps).
    * Returns (id, rid) pairs with start ≤ t < end. */
  def joinPointsInIntervals(points: DataFrame, intervals: DataFrame,
                            widthPow: Int = AUTO_POW): DataFrame = {
    val p = if (widthPow == AUTO_POW) autoPow(intervals) else widthPow
    require(p >= 1 && p <= 62, s"widthPow must be in [1,62], got $p")
    try points.sparkSession.conf.set(LAST_POW_KEY, p.toString)
    catch { case scala.util.control.NonFatal(_) => () }
    val w = 1L << p
    // parquet event times are TIMESTAMP_NTZ; unix_micros needs TIMESTAMP
    // (the session zone interprets the naive value — UTC in this engine)
    // integer `div` (IntegralDivide), not floor of a DOUBLE division:
    // exact at any epoch magnitude, and the SAME bucket map the
    // IntervalJoinRewrite path publishes — double-floor is only exact
    // under ~2^52 µs and floors (not truncates) pre-1970 timestamps,
    // silently forking the two LAST_POW bucket spaces on negative epochs
    val ps = points.withColumn("t", col("t").cast("timestamp"))
      .withColumn("__b", expr(s"unix_micros(t) div ${w}L"))
    // empty/inverted intervals match nothing — drop BEFORE the explode
    // (sequence() on an inverted range would walk it backwards)
    val b0 = expr(s"unix_micros(start) div ${w}L")
    val b1 = expr(s"(unix_micros(`end`) - 1) div ${w}L")
    // loud guard for CALLER-PINNED widths: the auto path's max/64 bound
    // caps ~65 buckets per interval, but a pinned fine width against a
    // long interval would demand an unbounded sequence (Spark errors past
    // ~2^31 elements, with an opaque message) — fail with the fix instead
    val ivs = intervals.filter(col("end") > col("start"))
      .withColumn("start", col("start").cast("timestamp"))
      .withColumn("end", col("end").cast("timestamp"))
      .withColumn("__b", explode(sequence(b0,
        when(b1 - b0 < MAX_COVER, b1).otherwise(raise_error(concat(
          lit(s"IntervalJoin: an interval covers >= $MAX_COVER buckets at widthPow=$p"
            + " — raise widthPow or use AUTO_POW (interval ["),
          col("start"), lit(", "), col("end"), lit("))")))))))
    ps.join(ivs, Seq("__b"))
      .filter(col("t") >= col("start") && col("t") < col("end"))
      .select(col("id"), col("rid"))
  }
}
