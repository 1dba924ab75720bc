package graft

import graft.functions.{HllAgg, HllAggregator}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class HllSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("register/rank kernel anchors and bounds") {
    // register = top 8 bits of the nonlinear 32-bit mix
    assert(HllAgg.register(0L) == 0)
    assert(HllAgg.register(1L) ==
      (HllAgg.mix(1L, 2654435761L, 49979693L) >> 24).toInt)
    // the mix really is nonlinear: an arithmetic progression of keys must
    // NOT map to an arithmetic progression of registers
    val regs = (0L until 6L).map(i => HllAgg.register(i * 1048583L))
    val diffs = regs.sliding(2).map(p => p(1) - p(0)).toSet
    assert(diffs.size > 1, s"registers look linear: $regs")
    (0L until 1000L).foreach { v =>
      val r = HllAgg.register(v); assert(r >= 0 && r < 256)
      val k = HllAgg.rank(v); assert(k >= 1 && k <= 33)
    }
    assert(HllAgg.rank(0L) == 33) // zero hash: all 32 bits are zero
    // rank = leading zeros + 1 of the second 32-bit mix
    val h2of1 = HllAgg.mix(1L, 2246822519L, 57885161L)
    assert(HllAgg.rank(1L) == 1 + java.lang.Long.numberOfLeadingZeros(h2of1) - 32)
  }

  test("distributed aggregation == sequential fold; merge is element-wise max") {
    import spark.implicits._
    val vals = (0L until 5000L).map(v => (v * 37) % 4096) // duplicates by design
    // sequential ground truth
    val agg = new HllAggregator
    val seqRegs = vals.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    // distributed: partial aggregation across 4 partitions must merge to
    // the identical registers (map-side combine = element-wise max)
    val hll = udaf(new HllAggregator, org.apache.spark.sql.Encoders.scalaLong)
    val got = vals.toDF("v").repartition(4)
      .agg(hll(col("v"))).head().getAs[Array[Byte]](0)
    assert(got.toSeq == seqRegs.toSeq)
    // merge axioms on random split points
    val (l, r) = vals.splitAt(1234)
    val a = l.foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val b = r.foldLeft(agg.zero)((b2, v) => agg.reduce(b2, v))
    assert(agg.merge(a.clone(), b).toSeq == seqRegs.toSeq)
  }

  test("estimate accuracy on planted cardinalities (p=8 → ~6.5% σ)") {
    val agg = new HllAggregator
    for (n <- Seq(100, 700, 5000, 50000)) {
      val regs = (0 until n).map(_.toLong * 1048583L) // distinct keys
        .foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
      val est = HllAgg.estimate(regs)
      assert(math.abs(est - n) / n < 0.25, s"n=$n est=$est")
    }
    // duplicates do not move the estimate
    val once = (0 until 1000).map(_.toLong).foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    val thrice = (0 until 3000).map(i => (i % 1000).toLong)
      .foldLeft(agg.zero)((b, v) => agg.reduce(b, v))
    assert(once.toSeq == thrice.toSeq)
  }
}
