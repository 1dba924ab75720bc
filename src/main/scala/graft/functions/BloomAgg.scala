package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Distributed BLOOM FILTER membership sketch — the set-membership
  * sibling of the HLL cardinality sketch (HllAgg): a fixed 64 Kib bitset
  * built with map-side partial aggregation and OR-merge, so building it
  * over 100 TB shuffles exactly one 8 KiB buffer per partition. The
  * pipeline use is DECONTAMINATION (ops/Decontaminate): the filter of a
  * small benchmark n-gram set broadcasts to every executor and corpus
  * rows probe it locally — no join, no shuffle of the corpus.
  *
  * Layout: WORDS unsigned 32-bit words stored in longs (bits 0..31
  * only). 32-bit words, not 64, because the driver-gate oracle mirrors
  * the word values in SQL and DuckDB's `1::BIGINT << b` overflows at
  * b = 63; with b ≤ 31 both engines produce the identical positive
  * word value.
  *
  * Probes: K = 4 via Kirsch–Mitzenmacher double hashing,
  * idx_i = (h1 + i·h2) mod BITS, where h1/h2 are the two nonlinear
  * multiply–xorshift–multiply mixes shared with the HLL sketch (a bare
  * multiplicative hash equidistributes arithmetic-progression keys —
  * the q60 finding — which for a Bloom filter under-fills words and
  * overstates FPR). For 0 ≤ v < 2^31 every product stays inside a
  * signed 64-bit integer (v·2654435761 passes Long.MaxValue near
  * v ≈ 3.47e9, well inside 2^32), so the whole probe sequence is
  * renderable in the oracle's SQL constant-for-constant (q68); larger
  * inputs (e.g. string hashes) wrap identically on every JVM but are
  * engine-internal only.
  */
object BloomAgg {
  val BITS_POW = 16
  val BITS: Long = 1L << BITS_POW // 65536 bits = 8 KiB
  val WORDS: Int = (BITS >> 5).toInt // 2048 32-bit words
  val K = 4

  def h1(v: Long): Long = HllAgg.mix(v, 2654435761L, 49979693L)
  def h2(v: Long): Long = HllAgg.mix(v, 2246822519L, 57885161L)

  /** Bit index of probe i ∈ [0, K) in a `bits`-bit filter. Nonnegative
    * for any v (the mixes mask to 32 bits before this sum). */
  def bitIndex(v: Long, i: Int, bits: Long = BITS): Int =
    (((h1(v) + i.toLong * h2(v)) & 0xFFFFFFFFL) % bits).toInt

  /** The filter width is CARRIED BY THE BUFFER (words.length × 32 bits),
    * so add/probe work for any sized filter — the SQL-mirrored q68 gate
    * keeps the 2048-word default, while decontamination sizes its
    * broadcast filter to the eval-gram count (a 56k-gram eval set fills
    * a fixed 8 KiB filter to 97%, FPR bound 0.87 — measured in the
    * round-7 n-gram sweep — which silently degrades the probe step to
    * a near-full corpus explode). */
  def add(words: Array[Long], v: Long): Unit = {
    val bits = words.length.toLong << 5
    var i = 0
    while (i < K) {
      val idx = bitIndex(v, i, bits)
      words(idx >> 5) |= (1L << (idx & 31))
      i += 1
    }
  }

  def mayContain(words: Array[Long], v: Long): Boolean = {
    val bits = words.length.toLong << 5
    var i = 0
    while (i < K) {
      val idx = bitIndex(v, i, bits)
      if (((words(idx >> 5) >> (idx & 31)) & 1L) == 0L) return false
      i += 1
    }
    true
  }

  /** Set-bit count — the fill diagnostic (FPR ≈ fill^K). */
  def fill(words: Array[Long]): Long = words.map(java.lang.Long.bitCount(_).toLong).sum

  /** Deterministic 64-bit polynomial hash for string members
    * (engine-internal; the SQL-mirrored path takes longs directly). */
  def hashString(s: String): Long = {
    var h = 1125899906842597L
    var i = 0
    while (i < s.length) { h = h * 31 + s.charAt(i); i += 1 }
    h
  }
}

/** The Aggregator: buffer = the bitset (2048 32-bit words by default —
  * the SQL-mirrored gate shape); `bitsPow` sizes it for callers whose
  * member count is known (decontamination). Merge = element-wise OR. */
final class BloomAggregator(bitsPow: Int = BloomAgg.BITS_POW)
    extends Aggregator[Long, Array[Long], Array[Long]] {
  require(bitsPow >= 5 && bitsPow <= 30, s"bitsPow out of range: $bitsPow")
  override def zero: Array[Long] = new Array[Long](1 << (bitsPow - 5))
  override def reduce(b: Array[Long], v: Long): Array[Long] = {
    BloomAgg.add(b, v); b
  }
  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
  override def finish(r: Array[Long]): Array[Long] = r
  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
  override def outputEncoder: Encoder[Array[Long]] = ExpressionEncoderHelp.arrayLong
}

private[functions] object ExpressionEncoderHelp {
  import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
  val arrayLong: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
}
