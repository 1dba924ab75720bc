package graft

import graft.img.{ImageOps, Images}
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ImageOpsSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  test("resize is deterministic and preserves content direction") {
    val img = Images.renderPixels(5L, 80, 60)
    val small = ImageOps.resize(img, 16, 16)
    assert(small.getWidth == 16 && small.getHeight == 16)
    val again = ImageOps.resize(img, 16, 16)
    (0 until 16).foreach(y => (0 until 16).foreach(x =>
      assert(small.getRGB(x, y) == again.getRGB(x, y))))
    // render has increasing-x red gradient: right side redder than left
    def red(i: BufferedLike, x: Int, y: Int): Int = (i.getRGB(x, y) >> 16) & 0xFF
    type BufferedLike = java.awt.image.BufferedImage
    assert(red(small, 15, 8) > red(small, 0, 8))
  }

  test("luma histogram is normalized and deterministic") {
    val img = Images.renderPixels(9L, 64, 64)
    val h = ImageOps.lumaHistogram(img)
    assert(h.length == 16)
    assert(h.sum >= 980 && h.sum <= 1000) // per-mille with floor rounding
    assert(h.sameElements(ImageOps.lumaHistogram(img)))
  }

  test("extract pipeline: thumbnails decode, features flow to near-dup pairs") {
    val images = Queries.imageTable(spark, 300)
    val feats = ImageOps.extract(images).cache()
    val rows = feats.collect()
    assert(rows.length == 300)
    rows.take(10).foreach { r =>
      val thumb = Images.decode(r.getAs[Array[Byte]]("thumb_png"))
      assert(thumb.getWidth == 16 && thumb.getHeight == 16)
      assert(r.getAs[scala.collection.Seq[Int]]("luma_hist").length == 16)
    }
    // near-dup scan runs and is symmetric-free (a < b) and thresholded
    val pairs = ImageOps.nearDupPairs(feats, maxL1 = 400, bits = 2).collect()
    pairs.foreach { p =>
      assert(p.getAs[String]("id_a") < p.getAs[String]("id_b"))
      assert(p.getAs[Int]("l1") <= 400)
    }
    feats.unpersist()
  }
}
