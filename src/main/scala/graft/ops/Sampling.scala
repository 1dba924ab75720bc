package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic weighted SAMPLING / data MIXING — the curation step
  * that rebalances a corpus across domains: weight < 1 down-samples a
  * domain, weight > 1 up-samples it by emitting repeated copies
  * (epoch-style repetition for under-represented sources).
  *
  * The keep/repeat decision is a pure function of the row id (a
  * nonlinear 32-bit multiply–xorshift mix — the same mix family as the
  * HLL sketch hash, whose bare-multiplicative predecessor measurably
  * equidistributed arithmetic-progression ids; see
  * functions/HllAggregator), NOT of rand(): re-running the pipeline, on
  * any cluster size, with any partitioning, reproduces the identical
  * sample. Weights are integer THOUSANDTHS, so the fractional-copy
  * decision is exact integer arithmetic on both engines — no float
  * thresholds to diverge.
  *
  * Scale design: a narrow projection + filter/explode, no shuffle, no
  * state; Catalyst pushes the surviving-column pruning into the scan,
  * and `copies == 0` rows are dropped before the (tiny, bounded ≤
  * maxWeight/1000 + 1) per-row sequence explode. At 100 TB this is the
  * cheapest possible plan shape: one codegen'd pass over the data.
  */
object Sampling {

  private val M32 = 0xFFFFFFFFL

  /** The 32-bit mix over a long id (column form, all codegen'd
    * built-ins): multiply–xorshift–multiply–xorshift, mirroring the
    * q60 oracle's SQL rendering constant-for-constant. */
  def mix32(id: Column): Column = {
    val a1 = (id * lit(2654435761L)).bitwiseAND(lit(M32))
    val a2 = a1.bitwiseXOR(shiftrightunsigned(a1, 16))
    val a3 = (a2 * lit(49979693L)).bitwiseAND(lit(M32))
    a3.bitwiseXOR(shiftrightunsigned(a3, 15))
  }

  /** Number of copies to emit for a row: floor(weight) copies always,
    * plus one more iff mix(id) mod 1000 falls under the fractional
    * part. `weightMilli` is the weight in integer thousandths (1500 =
    * 1.5x); 0 drops the row, 1000 keeps exactly one copy. A NEGATIVE
    * weight fails loudly — silently dropping the domain would be
    * indistinguishable from an intentional weight-0 drop (mirroring
    * packGreedy's negative-token validation). */
  def copies(id: Column, weightMilli: Column): Column = {
    // Spark's `/` is DOUBLE division even on longs; dividing only the
    // 1000-divisible part keeps the quotient IEEE-exact at any weight
    val whole =
      ((weightMilli - weightMilli % lit(1000L)) / lit(1000L)).cast("long")
    val n = whole +
      when(mix32(id) % lit(1000L) < weightMilli % lit(1000L), lit(1L))
        .otherwise(lit(0L))
    when(weightMilli < 0L,
      raise_error(concat(lit("weightedExplode: negative weight_milli "),
        weightMilli.cast("string"))).cast("long"))
      .otherwise(n)
  }

  /** Explode each row into its deterministic copy count. Adds a `copy`
    * column (0-based repeat index); rows whose weight resolves to zero
    * copies vanish. */
  def weightedExplode(df: DataFrame, idCol: String,
                      weightMilli: Column): DataFrame = {
    Seq("copy", "__n_copies").foreach { c =>
      require(!df.columns.contains(c),
        s"weightedExplode: input already has a '$c' column — it would be " +
          "silently overwritten")
    }
    val n = copies(col(idCol).cast("long"), weightMilli.cast("long"))
    df.withColumn("__n_copies", n)
      .filter(col("__n_copies") > 0)
      .withColumn("copy",
        explode(sequence(lit(0L), col("__n_copies") - 1)))
      .drop("__n_copies")
  }

  /** Deterministic TRAIN/VAL/TEST split — the same mix, bucketed by
    * cumulative permille: every re-run, at any parallelism or
    * partitioning, assigns each id the identical split (rand()-based
    * randomSplit is neither reproducible across cluster sizes nor
    * stable under retries). `splits` are (name, permille) summing to
    * 1000; assignment is h = mix32(id) mod 1000 walked through the
    * cumulative bounds in order. Row-local, zero shuffle. */
  def hashSplit(df: DataFrame, idCol: String,
                splits: Seq[(String, Int)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 1000,
      s"hashSplit: permilles must sum to 1000, got $splits")
    require(splits.forall(_._2 > 0), s"hashSplit: empty split bucket in $splits")
    require(!df.columns.contains("split"),
      "hashSplit: input already has a 'split' column")
    val h = mix32(col(idCol).cast("long")) % 1000
    val cum = splits.map(_._2).scanLeft(0)(_ + _).tail
    val assign = splits.init.zip(cum.init)
      .foldRight(lit(splits.last._1)) { case (((name, _), hi), acc) =>
        when(h < hi, name).otherwise(acc)
      }
    df.withColumn("split", assign)
  }
}
