package graft.index

/** Hilbert curve index used for spatially clustered layout.
  *
  * Port of the u32 bit-twiddling curve the reference uses for its FGB
  * spatial sort (`src/geoq/fgb/hilbert.rs:236-291`, itself based on the
  * public-domain github.com/rawrunprotected/hilbert_curves). Inputs are
  * 16-bit grid coordinates; output is the u32 Hilbert d-index.
  *
  * NOTE the reference's own test documents that this curve differs from the
  * flatgeobuf crate's sort (`fgb/mod.rs:306-358`) — the golden is THIS curve.
  *
  * JVM Int is a 32-bit two's-complement word, so `^ & | <<` and logical
  * right-shift `>>>` reproduce u32 semantics exactly; compare as unsigned.
  */
object Hilbert {
  val HILBERT_MAX: Double = (1 << 16) - 1

  def hilbert(x: Int, y: Int): Int = {
    var a = x ^ y
    var b = 0xFFFF ^ a
    var c = 0xFFFF ^ (x | y)
    var d = x & (y ^ 0xFFFF)

    var aa = a | (b >>> 1)
    var bb = (a >>> 1) ^ a
    var cc = ((c >>> 1) ^ (b & (d >>> 1))) ^ c
    var dd = ((a & (c >>> 1)) ^ (d >>> 1)) ^ d

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >>> 2)) ^ (b & (b >>> 2))
    bb = (a & (b >>> 2)) ^ (b & ((a ^ b) >>> 2))
    cc ^= (a & (c >>> 2)) ^ (b & (d >>> 2))
    dd ^= (b & (c >>> 2)) ^ ((a ^ b) & (d >>> 2))

    a = aa; b = bb; c = cc; d = dd
    aa = (a & (a >>> 4)) ^ (b & (b >>> 4))
    bb = (a & (b >>> 4)) ^ (b & ((a ^ b) >>> 4))
    cc ^= (a & (c >>> 4)) ^ (b & (d >>> 4))
    dd ^= (b & (c >>> 4)) ^ ((a ^ b) & (d >>> 4))

    a = aa; b = bb; c = cc; d = dd
    cc ^= (a & (c >>> 8)) ^ (b & (d >>> 8))
    dd ^= (b & (c >>> 8)) ^ ((a ^ b) & (d >>> 8))

    a = cc ^ (cc >>> 1)
    b = dd ^ (dd >>> 1)

    var i0 = x ^ y
    var i1 = b | (0xFFFF ^ (i0 | a))

    i0 = (i0 | (i0 << 8)) & 0x00FF00FF
    i0 = (i0 | (i0 << 4)) & 0x0F0F0F0F
    i0 = (i0 | (i0 << 2)) & 0x33333333
    i0 = (i0 | (i0 << 1)) & 0x55555555

    i1 = (i1 | (i1 << 8)) & 0x00FF00FF
    i1 = (i1 | (i1 << 4)) & 0x0F0F0F0F
    i1 = (i1 | (i1 << 2)) & 0x33333333
    i1 = (i1 | (i1 << 1)) & 0x55555555

    (i1 << 1) | i0
  }

  /** Hilbert value as an unsigned Long (sortable without unsigned compare). */
  def hilbertUnsigned(x: Int, y: Int): Long = hilbert(x, y) & 0xFFFFFFFFL

  /** Scale a bbox center into the dataset extent and index it — the
    * reference's `BBox::hilbert_bbox` (`src/geoq/fgb/hilbert.rs:180-187`). */
  def hilbertBbox(midX: Double, midY: Double,
                  extMinX: Double, extMinY: Double,
                  extMaxX: Double, extMaxY: Double): Long = {
    val w = extMaxX - extMinX
    val h = extMaxY - extMinY
    val x = math.floor(HILBERT_MAX * (midX - extMinX) / w).toInt
    val y = math.floor(HILBERT_MAX * (midY - extMinY) / h).toInt
    hilbertUnsigned(x, y)
  }
}
