package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) over Long
  * keys, p = 8 → 256 byte registers — the "novel sketch" operator class:
  * a typed Spark [[Aggregator]], so Catalyst plans it with MAP-SIDE
  * partial aggregation and the merge is the classic element-wise register
  * max — 256 bytes of state per group at ANY input scale, the shape a
  * 100 TB distinct-count needs (exact distinct shuffles every key).
  *
  * Hashing is an integer-only 32-bit multiply–xorshift–multiply mix
  * (murmur-fmix style) so the REGISTERS themselves are exactly
  * reproducible in SQL (the q60 driver gate hashes all 256, not a float
  * estimate). The mix must be NONLINEAR: a bare multiplicative hash maps
  * arithmetic-progression keys to an arithmetic progression mod 2³², which
  * equidistributes over registers — too few collisions, so linear
  * counting over-read ~27% at n=100; the xorshift steps break the
  * linearity (measured ≤ 7% error at n = 100…50000, the p=8 expectation).
  * register = top 8 bits of mix(v; 2654435761, 49979693); rank = 1 +
  * leading zeros of mix(v; 2246822519, 57885161) within 32 bits (33 for
  * zero). Exact SQL parity holds for 0 ≤ v < 2³¹ (every product stays in
  * BIGINT range for DuckDB — the second multiplier is < 2²⁶ on purpose);
  * the Scala side itself is total (wrap-around is mod 2⁶⁴, deterministic).
  */
object HllAgg {
  val P = 8
  val M: Int = 1 << P // 256 registers

  /** 32-bit multiply–xorshift–multiply–xorshift; m2 < 2²⁶ keeps the SQL
    * mirror's products inside BIGINT. */
  def mix(v: Long, m1: Long, m2: Long): Long = {
    var h = (v * m1) & 0xFFFFFFFFL
    h ^= h >> 16
    h = (h * m2) & 0xFFFFFFFFL
    h ^ (h >> 15)
  }

  def register(v: Long): Int = (mix(v, 2654435761L, 49979693L) >> 24).toInt

  def rank(v: Long): Int = {
    val h2 = mix(v, 2246822519L, 57885161L)
    var r = 1
    var bit = 31
    while (bit >= 0 && ((h2 >> bit) & 1L) == 0L) { r += 1; bit -= 1 }
    r
  }

  /** Standard bias-corrected estimate with the small-range (linear
    * counting) correction — float, so NOT driver-gated; unit-tested
    * against planted true cardinalities instead. */
  def estimate(regs: Array[Byte]): Double = {
    val m = regs.length.toDouble
    val alpha = 0.7213 / (1.0 + 1.079 / m)
    var sum = 0.0
    var zeros = 0
    regs.foreach { b =>
      sum += math.pow(2.0, -(b & 0xFF))
      if (b == 0) zeros += 1
    }
    val raw = alpha * m * m / sum
    if (raw <= 2.5 * m && zeros > 0) m * math.log(m / zeros) else raw
  }
}

/** The Aggregator itself: buffer = the 256 registers. */
final class HllAggregator extends Aggregator[Long, Array[Byte], Array[Byte]] {
  override def zero: Array[Byte] = new Array[Byte](HllAgg.M)
  override def reduce(b: Array[Byte], v: Long): Array[Byte] = {
    val i = HllAgg.register(v)
    val r = HllAgg.rank(v)
    if (r > (b(i) & 0xFF)) b(i) = r.toByte
    b
  }
  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xFF) > (a(i) & 0xFF)) a(i) = b(i)
      i += 1
    }
    a
  }
  override def finish(r: Array[Byte]): Array[Byte] = r
  override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
  override def outputEncoder: Encoder[Array[Byte]] = Encoders.BINARY
}
