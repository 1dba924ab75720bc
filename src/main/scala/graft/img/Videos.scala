package graft.img

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

/** Synthetic video table + frame-sampling kernels (multimodal pipeline:
  * video rows are opaque binary columns with typed metadata, frame-sample
  * is a partition-parallel flatMap).
  *
  * No video codec exists in this container, so the "video" is an honest
  * documented container of REAL PNG frames: magic `GVID` ‖ int32 n_frames
  * ‖ per-frame [int32 length ‖ png bytes]. The frames themselves go
  * through the genuine ImageIO encode/decode path (PNG is lossless, so a
  * decoded sampled frame must be BIT-IDENTICAL to its deterministic
  * re-render — the per-row integrity invariant q52 puts under the driver
  * hash gate). Frame pixel content reuses [[Images.renderPixels]] with a
  * per-(video, frame) seed.
  */
final case class VideoRow(video_id: String, bytes: Array[Byte], w: Int, h: Int,
                          n_frames: Int, fps: Int, caption: String)

object Videos {
  val MAGIC = 0x47564944 // "GVID"

  /** Deterministic per-(video, frame) pixel seed. */
  def frameSeed(idx: Long, frame: Int): Long = idx * 1000003L + frame * 7919L

  /** Frame count from the SAME multiplicative-hash expression the DuckDB
    * oracle evaluates (4..11 frames). */
  def frameCount(idx: Long): Int = (4L + ((idx * 2654435761L) % 4294967296L) % 8L).toInt

  def generate(idx: Long): VideoRow = {
    val w = 32 + (Images.splitmix64(idx * 23 + 11) & 31).toInt
    val h = 32 + (Images.splitmix64(idx * 29 + 13) & 31).toInt
    val n = frameCount(idx)
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(MAGIC)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val png = Images.encode(Images.renderPixels(frameSeed(idx, f), w, h), "png")
      dos.writeInt(png.length)
      dos.write(png)
      f += 1
    }
    dos.flush()
    VideoRow(f"vid$idx%09d", bos.toByteArray, w, h, n, 24, Images.caption(idx + 500000))
  }

  /** Parse the container into per-frame byte slices (no decode). Every
    * length is validated against the remaining buffer BEFORE allocation,
    * so truncated or corrupt containers reject with GeoqException instead
    * of EOFException / runaway Array allocations / silent empty videos. */
  def frames(bytes: Array[Byte]): IndexedSeq[Array[Byte]] = {
    if (bytes.length < 8)
      throw graft.core.GeoqException("bad video container: truncated header")
    val dis = new DataInputStream(new ByteArrayInputStream(bytes))
    if (dis.readInt() != MAGIC)
      throw graft.core.GeoqException("bad video container: missing GVID magic")
    val n = dis.readInt()
    if (n < 0)
      throw graft.core.GeoqException(s"bad video container: negative frame count $n")
    var remaining = bytes.length - 8
    (0 until n).map { f =>
      if (remaining < 4)
        throw graft.core.GeoqException(s"bad video container: truncated at frame $f")
      val len = dis.readInt()
      remaining -= 4
      if (len < 0 || len > remaining)
        throw graft.core.GeoqException(
          s"bad video container: frame $f length $len vs $remaining bytes remaining")
      val b = new Array[Byte](len)
      dis.readFully(b)
      remaining -= len
      b
    }
  }

  /** Every k-th frame (indexes 0, k, 2k, …), DECODED through the real
    * ImageIO path. Row-local: the distributed form is a flatMap over the
    * video table, one task per partition of videos. */
  def sampleFrames(bytes: Array[Byte], k: Int): Seq[(Int, java.awt.image.BufferedImage)] = {
    require(k >= 1, s"sample stride must be >= 1, got $k")
    val fs = frames(bytes)
    (0 until fs.length by k).map(i => (i, Images.decode(fs(i))))
  }

  /** Id offset of planted near-duplicate twins (q54) — far above any
    * test-scale video index, mirrored verbatim in the oracle SQL. */
  val TWIN_OFFSET = 1000000L

  /** The planted NEAR-DUPLICATE twin of a video: every frame but the LAST
    * is decoded and re-encoded through the real ImageIO path (PNG is
    * lossless, so the twin's decoded pixels are bit-identical to the
    * original's — the provable-recall anchor for the q54 LSH join), then
    * repacked into a fresh container. A "re-encoded + frame-dropped copy"
    * in training-data-dedup terms. */
  def twin(v: VideoRow, idx: Long): VideoRow = {
    val fs = frames(v.bytes)
    val n = v.n_frames - 1
    val bos = new ByteArrayOutputStream()
    val dos = new DataOutputStream(bos)
    dos.writeInt(MAGIC)
    dos.writeInt(n)
    var f = 0
    while (f < n) {
      val re = Images.encode(Images.decode(fs(f)), "png")
      dos.writeInt(re.length)
      dos.write(re)
      f += 1
    }
    dos.flush()
    VideoRow(f"vid${idx + TWIN_OFFSET}%09d", bos.toByteArray, v.w, v.h, n, v.fps, v.caption)
  }
}
