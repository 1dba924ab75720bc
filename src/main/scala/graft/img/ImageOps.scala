package graft.img

import java.awt.image.BufferedImage
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column operators over the image table: the binary `bytes`
  * column is opaque to Catalyst; these ops give it typed, batched,
  * partition-parallel semantics (decode / resize / feature-extract), the
  * Scala equivalent of Pandas-UDF `mapInPandas` pipelines. Unlike the
  * Python path this container can't support, the decode here is REAL
  * (javax.imageio), so the plumbing and the kernels are both tested.
  *
  * Scale shape: one `mapPartitions`-style pass per batch of rows, codecs
  * pooled per thread (see Images), output schema fixed up front so the
  * plan stays columnar on either side of the opaque kernel.
  */
object ImageOps {

  /** Nearest-neighbor resize (deterministic, no AWT rendering pipeline —
    * Graphics2D scaling is not bit-stable across JVMs). */
  def resize(src: BufferedImage, outW: Int, outH: Int): BufferedImage = {
    val out = new BufferedImage(outW, outH, BufferedImage.TYPE_3BYTE_BGR)
    val od = out.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
    val w = src.getWidth; val h = src.getHeight
    val fast = src.getType == BufferedImage.TYPE_3BYTE_BGR
    val sd: Array[Byte] =
      if (fast) src.getRaster.getDataBuffer.asInstanceOf[java.awt.image.DataBufferByte].getData
      else null
    var y = 0
    var o = 0
    while (y < outH) {
      val sy = y * h / outH
      var x = 0
      while (x < outW) {
        val sx = x * w / outW
        if (fast) {
          val so = (sy * w + sx) * 3
          od(o) = sd(so); od(o + 1) = sd(so + 1); od(o + 2) = sd(so + 2)
        } else {
          val rgb = src.getRGB(sx, sy)
          od(o) = (rgb & 0xFF).toByte
          od(o + 1) = ((rgb >> 8) & 0xFF).toByte
          od(o + 2) = ((rgb >> 16) & 0xFF).toByte
        }
        o += 3
        x += 1
      }
      y += 1
    }
    out
  }

  /** 16-bin luma histogram, L1-normalized to per-mille ints (integer output
    * → cross-run deterministic, join/dedup-friendly). */
  def lumaHistogram(img: BufferedImage): Array[Int] = {
    val bins = new Array[Long](16)
    val w = img.getWidth; val h = img.getHeight
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        val l = (299 * ((rgb >> 16) & 0xFF) + 587 * ((rgb >> 8) & 0xFF) +
          114 * (rgb & 0xFF)) / 1000
        bins(math.min(15, l / 16)) += 1
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h
    bins.map(b => ((b * 1000) / n).toInt)
  }

  /** Decode → thumbnail (re-encoded png) + feature vector + anchor, one pass
    * over the binary column. The engine's feature-extraction operator. */
  def extract(images: Dataset[ImageRow], thumbW: Int = 16, thumbH: Int = 16): DataFrame = {
    import images.sparkSession.implicits._
    images.map { r =>
      val img = Images.decode(r.bytes)
      val thumb = resize(img, thumbW, thumbH)
      val hist = lumaHistogram(img)
      (r.image_id, r.fmt, Images.encode(thumb, "png"), hist,
        Images.anchorLon(r.phash), Images.anchorLat(r.phash))
    }.toDF("image_id", "fmt", "thumb_png", "luma_hist", "lon", "lat")
  }

  /** Near-dup images by feature-histogram distance within anchor tiles:
    * cell-bucketed candidate generation (same pattern as the spatial join)
    * then exact L1 histogram distance — image-level near-dup dedup. */
  def nearDupPairs(features: DataFrame, maxL1: Int = 60, bits: Int = 4): DataFrame = {
    val (cx, cy) = graft.join.SpatialJoin.cellCols(col("lon"), col("lat"), bits)
    val keyed = features.select(col("image_id"), col("luma_hist"),
      cx.as("cx"), cy.as("cy"))
    val l1 = udf((a: Seq[Int], b: Seq[Int]) => {
      var s = 0
      var i = 0
      while (i < a.length) { s += math.abs(a(i) - b(i)); i += 1 }
      s
    })
    keyed.as("a").join(keyed.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") === col("b.cy") &&
          col("a.image_id") < col("b.image_id"))
      .withColumn("l1", l1(col("a.luma_hist"), col("b.luma_hist")))
      .filter(col("l1") <= maxL1)
      .select(col("a.image_id").as("id_a"), col("b.image_id").as("id_b"), col("l1"))
  }
}
