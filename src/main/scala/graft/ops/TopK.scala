package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Group-wise TOP-K as a bounded-state AGGREGATOR — `row_number() OVER
  * (PARTITION BY key ORDER BY ord) <= k` semantics with O(k) state per
  * group per partition and map-side combine.
  *
  * Honest relationship to the window form on modern Spark: for the
  * literal rank-filter pattern, Spark 3.5+'s own WindowGroupLimit rule
  * ALREADY bounds the shuffle map-side (measured in ScaleSmoke: 6,145
  * shuffled rows for the window form at 2M rows × 64 domains — not the
  * naive full-group 2M). What the Aggregator still buys: (a) ~3× fewer
  * shuffled rows (one k-capped MERGED buffer per group per partition —
  * measured 2,049 — vs k rows per group per partition), (b) NO
  * per-partition sort — WindowGroupLimitExec requires its input sorted
  * by (key, ord), an O(n log n) local sort per partition, while the
  * hash-aggregate path is one O(n·k) pass, and (c) composition: being
  * an Aggregator it runs alongside other aggregations in the same
  * groupBy pass, which the window form cannot. Ties break on id, so
  * the result is total-order deterministic either way.
  *
  * With ord = a deterministic integer hash of the row id (Sampling
  * .mix32), this IS uniform k-per-group sampling — reproducible on any
  * cluster size, no rand(), the q72 gate. With ord = a real score it
  * is group-wise top-k selection (best-k documents per domain).
  */
object TopK {

  /** Smallest-k selector over (ord, id) pairs: an ascending sorted
    * buffer capped at k. reduce/merge are both O(k); merge is a sorted
    * merge, so the Aggregator is associative + commutative (spec-
    * checked) — safe for partial aggregation. */
  final class TopKAgg(k: Int)
    extends Aggregator[(Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
    require(k >= 1, s"topK: k must be >= 1, got $k")
    private def lt(a: (Long, Long), b: (Long, Long)): Boolean =
      a._1 < b._1 || (a._1 == b._1 && a._2 < b._2)
    override def zero: Seq[(Long, Long)] = Vector.empty
    override def reduce(buf: Seq[(Long, Long)], v: (Long, Long)): Seq[(Long, Long)] = {
      if (buf.size >= k && !lt(v, buf.last)) buf
      else {
        val (lo, hi) = buf.partition(lt(_, v))
        (lo ++ (v +: hi)).take(k)
      }
    }
    override def merge(a: Seq[(Long, Long)], b: Seq[(Long, Long)]): Seq[(Long, Long)] = {
      val out = Vector.newBuilder[(Long, Long)]
      var (i, j, n) = (0, 0, 0)
      while (n < k && (i < a.size || j < b.size)) {
        val takeA = j >= b.size || (i < a.size && lt(a(i), b(j)))
        if (takeA) { out += a(i); i += 1 } else { out += b(j); j += 1 }
        n += 1
      }
      out.result()
    }
    override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
    override def bufferEncoder: Encoder[Seq[(Long, Long)]] = TopK.pairSeqEnc
    override def outputEncoder: Encoder[Seq[(Long, Long)]] = TopK.pairSeqEnc
  }

  private[ops] val pairSeqEnc: Encoder[Seq[(Long, Long)]] = {
    import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
    ExpressionEncoder[Seq[(Long, Long)]]()
  }

  /** Keep the k smallest (ordCol, idCol) rows per key. Returns
    * (keyCols..., idCol, ord, rank) with rank 1..k in ascending
    * (ord, id) order — `row_number` semantics over non-null integral
    * inputs. ordCol must already be an INTEGRAL type (a fractional
    * score silently truncated by a long cast would select by id, not
    * score — scale fractional scores to fixed-point first); null ord
    * or id rows fail loudly rather than being ranked or dropped. */
  def topKByKey(df: DataFrame, keyCols: Seq[String], idCol: String,
                ordCol: Column, k: Int): DataFrame = {
    val reserved = Seq("__ord", "__id", "ord", "rank", "pos", "col")
    (keyCols :+ idCol).foreach { c =>
      require(!reserved.contains(c),
        s"topKByKey: column name '$c' collides with a synthesized " +
          s"output column (${reserved.mkString(", ")})")
    }
    import org.apache.spark.sql.types._
    val ordType = df.select(ordCol.as("__o")).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(ordType),
      s"topKByKey: ord column must be integral, got $ordType — scale " +
        "fractional scores to fixed-point (e.g. (score * 1e6).cast(\"long\"))")
    def notNull(c: Column, what: String): Column =
      when(c.isNull, raise_error(lit(
        s"topKByKey: null $what — rank or drop nulls explicitly upstream")))
        .otherwise(c)
    val agg = udaf(new TopKAgg(k),
      Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
    val keyed = df.select(
      keyCols.map(col) :+ notNull(ordCol, "ord value").cast("long").as("__ord")
        :+ notNull(col(idCol), s"$idCol value").cast("long").as("__id"): _*)
    keyed
      .groupBy(keyCols.map(col): _*)
      .agg(agg(col("__ord"), col("__id")).as("__top"))
      .select(keyCols.map(col) :+ posexplode(col("__top")): _*)
      .select(keyCols.map(col)
        :+ col("col._2").as(idCol)
        :+ col("col._1").as("ord")
        :+ (col("pos") + lit(1)).cast("long").as("rank"): _*)
  }
}
