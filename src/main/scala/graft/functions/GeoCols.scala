package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-native (whole-stage-codegen'd) encoders for the hot key paths.
  * These compose only built-in functions — no UDF boxing — and are pinned
  * to the imperative kernels by differential property tests (KernelSpec).
  */
object GeoCols {

  private val BASE32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** Geohash string from pre-quantized cell indices — the column mirror of
    * `Geohash.fromIndices` (bit-interleave starting with the lon MSB, 5
    * bits per base32 char). Built-ins only: shifts, masks, substr, concat. */
  def ghCol(lonIdx: Column, latIdx: Column, len: Int): Column = {
    val nBits = 5 * len
    val lonBits = (nBits + 1) / 2
    val latBits = nBits / 2
    val chars = (0 until len).map { i =>
      val code = (0 until 5).map { k =>
        val j = 5 * i + k
        val src =
          if (j % 2 == 0) shiftright(lonIdx, lonBits - 1 - j / 2)
          else shiftright(latIdx, latBits - 1 - (j - 1) / 2)
        shiftleft(src.bitwiseAND(lit(1L)), 4 - k)
      }.reduce(_ bitwiseOR _)
      lit(BASE32).substr((code + lit(1)).cast("int"), lit(1))
    }
    concat(chars: _*)
  }
}
