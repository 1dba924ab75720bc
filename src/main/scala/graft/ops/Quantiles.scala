package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles over a long column WITHOUT a global
  * sort — the scalable alternative to `ORDER BY v LIMIT 1 OFFSET k`
  * (a full-shuffle sort) and to approx_percentile (not exact).
  *
  * Histogram bisection, level-batched: each level runs ONE job that
  * scans only rows inside the still-active ranges (a pushdown-friendly
  * range predicate), buckets them into ≤ `fanout` power-of-two-width
  * strata per range, and aggregates counts — ≤ #quantiles × fanout
  * rows ever reach the driver, never raw values. Walking the counts
  * pins each target rank into one bucket, shrinking its range by
  * `fanout`× per level, so a full 64-bit domain resolves in
  * ⌈64/log2(fanout)⌉ ≈ 6 levels. Bucket widths are powers of two and
  * bucketing is subtract+shift — exact integer ops (Spark's `/` on
  * longs is DOUBLE division and loses exactness past 2^53, so no
  * division anywhere).
  *
  * Quantiles are RATIONALS (num, den): the target rank is
  * ceil(n·num/den) in integer arithmetic, so engine and oracle can
  * never disagree on which element a quantile names. Ranks are
  * 1-based; (1,1) is the max, (1,n) the min for n rows.
  *
  * At 100 TB: level jobs re-scan the (filtered) input rather than
  * caching it — with parquet min/max pruning each level reads only
  * row groups overlapping the active ranges, which shrink
  * geometrically; driver state is O(quantiles), per-job shuffle is
  * O(quantiles × fanout) rows.
  */
object Quantiles {

  private case class Target(qNum: Long, qDen: Long, globalRank: Long,
                            var lo: Long, var hi: Long, var rank: Long) {
    def resolved: Boolean = lo == hi
  }

  /** Compute exact values at the given rational quantiles of
    * `df(valueCol)` (cast to long). Returns (q_num, q_den, rank, value)
    * with one row per requested quantile (duplicates preserved). */
  def exactQuantiles(df: DataFrame, valueCol: String,
                     quantiles: Seq[(Long, Long)], fanout: Int = 4096,
                     maxLevels: Int = 16): DataFrame = {
    require(fanout >= 2, s"fanout must be >= 2, got $fanout")
    quantiles.foreach { case (num, den) =>
      require(num > 0 && den > 0 && num <= den,
        s"quantile must be a rational in (0, 1], got $num/$den")
    }
    val spark = df.sparkSession
    // nulls are excluded up front (standard null-ignoring quantile
    // semantics): counting them into n while no histogram bucket holds
    // them would shift every resolved rank
    val v = df.select(col(valueCol).cast("long").as("v"))
      .filter(col("v").isNotNull)

    val Row(n: Long, mnAny, mxAny) =
      v.agg(count(lit(1)), min("v"), max("v")).head()
    val schema = new org.apache.spark.sql.types.StructType()
      .add("q_num", "long").add("q_den", "long")
      .add("rank", "long").add("value", "long")
    if (n == 0L)
      return spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], schema)
    val (mn, mx) = (mnAny.asInstanceOf[Long], mxAny.asInstanceOf[Long])

    // rank = ceil(n * num / den), exact in BigInt then narrowed
    val targets = quantiles.map { case (num, den) =>
      val k = ((BigInt(n) * num + den - 1) / den).toLong
      Target(num, den, k, mn, mx, k)
    }.toArray

    // (v - lo) must not overflow a long inside a range: if max - min
    // does, split once at zero (one extra count) — both halves then
    // have width <= Long.MaxValue and every later split only shrinks
    if (BigInt(mx) - BigInt(mn) + 1 > Long.MaxValue) {
      val negs = v.filter(col("v") < 0L).count()
      targets.foreach { t =>
        if (t.rank <= negs) { t.hi = -1L }
        else { t.lo = 0L; t.rank -= negs }
      }
    }

    var level = 0
    while (targets.exists(!_.resolved)) {
      if (level >= maxLevels)
        throw new IllegalStateException(
          s"exactQuantiles did not converge in $maxLevels levels — " +
            s"active: ${targets.filter(!_.resolved).mkString(", ")}")
      level += 1
      // active ranges are pairwise equal-or-disjoint (each is a bucket
      // of the previous level's partition of the domain): dedupe equals
      val ranges = targets.filter(!_.resolved).map(t => (t.lo, t.hi))
        .distinct.zipWithIndex
      // per-range shift: smallest s with ceil(width / 2^s) <= fanout
      val shifts = ranges.map { case ((lo, hi), _) =>
        val width = BigInt(hi) - BigInt(lo) + 1
        var s = 0
        while (width > (BigInt(fanout) << s)) s += 1
        s
      }
      val ridxCol = ranges.foldLeft(lit(-1L)) {
        case (acc, ((lo, hi), i)) =>
          when(col("v").between(lo, hi), lit(i.toLong)).otherwise(acc)
      }
      val bucketCol = ranges.zip(shifts).foldLeft(lit(0L)) {
        case (acc, (((lo, _), i), s)) =>
          when(col("ridx") === i.toLong,
            shiftright(col("v") - lit(lo), s)).otherwise(acc)
      }
      val counts = v.withColumn("ridx", ridxCol)
        .filter(col("ridx") >= 0L)
        .withColumn("bucket", bucketCol)
        .groupBy("ridx", "bucket").agg(count(lit(1)).as("cnt"))
        .collect() // bounded: <= #quantiles * fanout aggregated rows
        .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
      for (t <- targets if !t.resolved) {
        val i = ranges.collectFirst {
          case ((lo, hi), idx) if lo == t.lo && hi == t.hi => idx
        }.get
        val s = shifts(i)
        var b = 0L
        var remaining = t.rank
        var found = false
        val maxBucket = (BigInt(t.hi) - BigInt(t.lo)) >> s
        while (!found) {
          if (b > maxBucket)
            throw new IllegalStateException(
              s"exactQuantiles: rank ${t.rank} exceeds rows in " +
                s"[${t.lo}, ${t.hi}] — input changed between levels?")
          val cnt = counts.getOrElse((i.toLong, b), 0L)
          if (remaining <= cnt) {
            val newLo = t.lo + (b << s)
            // the LAST bucket's nominal end (newLo + 2^s - 1) can pass
            // Long.MaxValue when fanout·2^s overshoots the range width,
            // so compare against (hi - (2^s - 1)) — which never
            // underflows since 2^s <= width — instead of adding first
            t.hi = if (t.hi - ((1L << s) - 1L) <= newLo) t.hi
                   else newLo + ((1L << s) - 1L)
            t.lo = newLo
            t.rank = remaining
            found = true
          } else { remaining -= cnt; b += 1L }
        }
      }
    }

    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      targets.map(t => Row(t.qNum, t.qDen, t.globalRank, t.lo))
        .toSeq.asJava, schema)
  }
}
