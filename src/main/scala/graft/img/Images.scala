package graft.img

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}

/** Synthetic image+caption table + image kernels (north-rule input shape:
  * `(image_id string, bytes binary, w int, h int, fmt string, caption string,
  * phash long)`).
  *
  * Everything is deterministic from `idx` (splitmix64 PRNG): pixel field =
  * smooth per-image gradients + mild hash noise (JPEG-friendly so the
  * lossy round-trip clears PSNR ≥ 40 dB), captions from a seeded word list,
  * phash = 8×8 block-mean luma hash (aHash family — a published perceptual
  * hash; pure function of decoded pixels). Anchor derivation per
  * FIXTURES.md §4: phash bits → (lat, lon).
  */
final case class ImageRow(image_id: String, bytes: Array[Byte], w: Int, h: Int,
                          fmt: String, caption: String, phash: Long)

object Images {
  // ImageIO's default stream cache is file-backed: every encode/decode
  // creates a temp file under a synchronized cache directory, serializing
  // all executor threads. Memory-backed streams restore linear scaling.
  ImageIO.setUseCache(false)

  // ImageIO.read/write consult javax.imageio.spi.ServiceRegistry on EVERY
  // call; SubRegistry.getServiceProviders is a global synchronized monitor
  // that serializes all 32 executor threads (observed via jstack: 8/32
  // threads BLOCKED on it during bench). Resolve the SPIs once; instantiate
  // readers/writers directly per call (instances are cheap and not shared).
  private val pngWriterSpi = ImageIO.getImageWritersByFormatName("png").next().getOriginatingProvider
  private val jpegWriterSpi = ImageIO.getImageWritersByFormatName("jpeg").next().getOriginatingProvider
  private val pngReaderSpi = ImageIO.getImageReadersByFormatName("png").next().getOriginatingProvider
  private val jpegReaderSpi = ImageIO.getImageReadersByFormatName("jpeg").next().getOriginatingProvider

  // writer/reader instances carry sizable internal buffers; pool them per
  // executor thread instead of allocating per image (GC pressure is the
  // residual many-core scaling limiter after the registry-lock fix)
  private val pngWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    pngWriterSpi.createWriterInstance())
  private val jpegWriterTL = ThreadLocal.withInitial[javax.imageio.ImageWriter](() =>
    jpegWriterSpi.createWriterInstance())
  private val pngReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    pngReaderSpi.createReaderInstance())
  private val jpegReaderTL = ThreadLocal.withInitial[javax.imageio.ImageReader](() =>
    jpegReaderSpi.createReaderInstance())

  // --- deterministic PRNG (public splitmix64) ---
  def splitmix64(seed: Long): Long = {
    var z = seed + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  private val WORDS = Vector("tile", "anchor", "harbor", "ridge", "meadow",
    "lantern", "orchid", "basalt", "cinder", "breeze", "canyon", "delta",
    "ember", "fjord", "glacier", "heath", "islet", "jetty", "knoll", "lagoon")

  def caption(idx: Long): String = {
    val n = 3 + (splitmix64(idx * 7 + 1) & 3).toInt // 3..6 words
    (0 until n).map { i =>
      WORDS((splitmix64(idx * 131 + i) & 0x7FFFFFFF).toInt % WORDS.size)
    }.mkString(" ") + s" #$idx"
  }

  /** Smooth deterministic RGB field: per-image gradient directions + a mild
    * sinusoidal texture. Smoothness keeps JPEG round-trips well above the
    * 40 dB PSNR bar. */
  def renderPixels(idx: Long, w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    // direct raster writes: setRGB goes through per-pixel ColorModel
    // conversion and defeats scaling on many cores
    val data = img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
    val s1 = (splitmix64(idx) & 0xFF).toInt
    val s2 = (splitmix64(idx + 1) & 0xFF).toInt
    val s3 = (splitmix64(idx + 2) & 0xFF).toInt
    val fx = 1.0 + (splitmix64(idx + 3) & 3).toInt
    val fy = 1.0 + (splitmix64(idx + 4) & 3).toInt
    var y = 0
    var o = 0
    while (y < h) {
      val gy = y.toDouble / h
      var x = 0
      while (x < w) {
        val gx = x.toDouble / w
        val tex = 20.0 * math.sin(2 * math.Pi * (fx * gx + fy * gy))
        data(o) = clamp(s3 + 60 * gx + 60 * gy).toByte     // B
        data(o + 1) = clamp(s2 + 120 * gy - tex).toByte    // G
        data(o + 2) = clamp(s1 + 120 * gx + tex).toByte    // R
        o += 3
        x += 1
      }
      y += 1
    }
    img
  }

  private def clamp(v: Double): Int = math.max(0, math.min(255, v.toInt))

  def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    fmt match {
      case "png" =>
        val writer = pngWriterTL.get()
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), null)
        writer.reset()
      case "jpeg" =>
        val writer = jpegWriterTL.get()
        val p = writer.getDefaultWriteParam
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
        p.setCompressionQuality(0.98f)
        writer.setOutput(ios)
        writer.write(null, new IIOImage(img, null, null), p)
        writer.reset()
      case other => throw new IllegalArgumentException(s"fmt $other")
    }
    ios.close()
    bos.toByteArray
  }

  def decode(bytes: Array[Byte]): BufferedImage = {
    // sniff the two supported containers by magic bytes (PNG \x89PNG, JPEG
    // \xFF\xD8) — direct SPI dispatch, no registry monitor
    val spi =
      if (bytes.length > 1 && (bytes(0) & 0xFF) == 0xFF && (bytes(1) & 0xFF) == 0xD8) jpegReaderSpi
      else pngReaderSpi
    val reader =
      if (spi eq jpegReaderSpi) jpegReaderTL.get() else pngReaderTL.get()
    val iis = new javax.imageio.stream.MemoryCacheImageInputStream(new ByteArrayInputStream(bytes))
    reader.setInput(iis)
    try reader.read(0)
    catch {
      // corrupt payloads (e.g. a structurally-valid video container whose
      // frame bytes are mangled) reject like every other bad input instead
      // of leaking raw ImageIO exceptions
      case scala.util.control.NonFatal(e) =>
        // keep the original class name: several decoder failure modes carry
        // a null message, and a fleet-wide systematic failure must stay
        // diagnosable from task logs
        throw graft.core.GeoqException(
          s"bad image bytes: ${e.getClass.getSimpleName}: ${e.getMessage}")
    } finally {
      // always restore the pooled thread-local reader — a throwing read
      // must not leave it pointing at the stale stream
      try reader.reset()
      catch { case scala.util.control.NonFatal(_) => () }
      iis.close()
    }
  }

  /** 8×8 block-mean luma hash (aHash): bit i set iff block mean > global
    * mean. Row-major from top-left, bit 63 = first block. */
  def phash(img: BufferedImage): Long = {
    val means = new Array[Double](64)
    val w = img.getWidth; val h = img.getHeight
    // fast path: direct 3-byte raster (our render + standard jpeg/png
    // decoders produce TYPE_3BYTE_BGR); fall back to getRGB otherwise
    val fast = img.getType == BufferedImage.TYPE_3BYTE_BGR
    val data: Array[Byte] =
      if (fast) img.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
      else null
    def luma(x: Int, y: Int): Double =
      if (fast) {
        val o = (y * w + x) * 3
        0.299 * (data(o + 2) & 0xFF) + 0.587 * (data(o + 1) & 0xFF) + 0.114 * (data(o) & 0xFF)
      } else {
        val rgb = img.getRGB(x, y)
        0.299 * ((rgb >> 16) & 0xFF) + 0.587 * ((rgb >> 8) & 0xFF) + 0.114 * (rgb & 0xFF)
      }
    var by = 0
    while (by < 8) {
      var bx = 0
      while (bx < 8) {
        val x0 = bx * w / 8; val x1 = math.max(x0 + 1, (bx + 1) * w / 8)
        val y0 = by * h / 8; val y1 = math.max(y0 + 1, (by + 1) * h / 8)
        var sum = 0.0; var n = 0
        var y = y0
        while (y < math.min(y1, h)) {
          var x = x0
          while (x < math.min(x1, w)) {
            sum += luma(x, y)
            n += 1; x += 1
          }
          y += 1
        }
        means(by * 8 + bx) = if (n == 0) 0.0 else sum / n
        bx += 1
      }
      by += 1
    }
    val global = means.sum / 64.0
    var out = 0L
    var i = 0
    while (i < 64) {
      if (means(i) > global) out |= (1L << (63 - i))
      i += 1
    }
    out
  }

  /** Anchor point from phash (FIXTURES.md §4): the hash bits are first
    * dispersed through splitmix64 because block-mean hash bits are spatially
    * correlated across images (similar gradients → similar high bits), which
    * would collapse anchors onto a few tiles. Still a fixed, documented,
    * deterministic function of phash alone. */
  def anchorBits(phash: Long): Long = splitmix64(phash)
  def anchorLat(phash: Long): Double =
    -90.0 + 180.0 * ((anchorBits(phash) >>> 32).toDouble / 4294967296.0)
  def anchorLon(phash: Long): Double =
    -180.0 + 360.0 * ((anchorBits(phash) & 0xFFFFFFFFL).toDouble / 4294967296.0)

  def generate(idx: Long): ImageRow = {
    val w = 32 + (splitmix64(idx * 13 + 5) & 63).toInt // 32..95
    val h = 32 + (splitmix64(idx * 17 + 9) & 63).toInt
    val fmt = if ((splitmix64(idx * 19 + 3) & 1) == 0) "png" else "jpeg"
    val img = renderPixels(idx, w, h)
    val bytes = encode(img, fmt)
    // phash over the DECODED bytes (what a consumer would see), so lossy
    // formats hash their actual stored pixels.
    val ph = phash(decode(bytes))
    ImageRow(f"img$idx%09d", bytes, w, h, fmt, caption(idx), ph)
  }

  /** MD5 of the DECODED pixel field (dims ‖ row-major RGB bytes) — an
    * exact content id for lossless comparisons that does not depend on
    * encoder byte determinism (q54's near-dup refine key). */
  def pixelMd5(img: BufferedImage): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val w = img.getWidth; val h = img.getHeight
    md.update(java.nio.ByteBuffer.allocate(8).putInt(w).putInt(h).array())
    val row = new Array[Byte](w * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        row(3 * x) = ((rgb >> 16) & 0xFF).toByte
        row(3 * x + 1) = ((rgb >> 8) & 0xFF).toByte
        row(3 * x + 2) = (rgb & 0xFF).toByte
        x += 1
      }
      md.update(row)
      y += 1
    }
    md.digest().map(b => f"$b%02x").mkString
  }

  /** Peak signal-to-noise ratio between two same-size images, dB.
    * Infinity for identical pixels. */
  def psnr(a: BufferedImage, b: BufferedImage): Double = {
    require(a.getWidth == b.getWidth && a.getHeight == b.getHeight, "size mismatch")
    var se = 0.0
    var n = 0
    var y = 0
    while (y < a.getHeight) {
      var x = 0
      while (x < a.getWidth) {
        val pa = a.getRGB(x, y); val pb = b.getRGB(x, y)
        var c = 0
        while (c < 3) {
          val d = ((pa >> (8 * c)) & 0xFF) - ((pb >> (8 * c)) & 0xFF)
          se += d * d; n += 1
          c += 1
        }
        x += 1
      }
      y += 1
    }
    if (se == 0.0) Double.PositiveInfinity
    else 10.0 * math.log10(255.0 * 255.0 * n / se)
  }
}
