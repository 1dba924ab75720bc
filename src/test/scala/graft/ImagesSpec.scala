package graft

import graft.img.Images
import org.scalatest.funsuite.AnyFunSuite

/** North-rule image invariants (BASELINE.json input_hint): decoded-pixel
  * allclose (PSNR ≥ 40 dB for lossy, bit-exact for png) + caption equality;
  * phash-derived anchors are valid coordinates; generation is deterministic.
  */
class ImagesSpec extends AnyFunSuite {

  test("generation is deterministic") {
    val a = Images.generate(42L)
    val b = Images.generate(42L)
    assert(a.image_id == b.image_id)
    assert(a.phash == b.phash)
    assert(a.caption == b.caption)
    assert(java.util.Arrays.equals(a.bytes, b.bytes))
  }

  test("png round-trip is bit-exact; jpeg round-trip clears 40 dB PSNR") {
    (0L until 64L).foreach { i =>
      val r = Images.generate(i)
      val img0 = Images.decode(r.bytes)
      assert(img0.getWidth == r.w && img0.getHeight == r.h)
      val re = Images.encode(img0, r.fmt)
      val img1 = Images.decode(re)
      val p = Images.psnr(img0, img1)
      if (r.fmt == "png") assert(p.isInfinite, s"png not lossless for $i")
      else assert(p >= 40.0, s"jpeg psnr $p < 40 for $i (w=${r.w},h=${r.h})")
    }
  }

  test("captions regenerate byte-identically") {
    (0L until 200L).foreach { i =>
      val r = Images.generate(i)
      assert(r.caption == Images.caption(i))
    }
  }

  test("phash anchors are valid lat/lon and spread out") {
    val anchors = (0L until 256L).map { i =>
      val r = Images.generate(i)
      (Images.anchorLat(r.phash), Images.anchorLon(r.phash))
    }
    anchors.foreach { case (lat, lon) =>
      assert(lat >= -90 && lat < 90)
      assert(lon >= -180 && lon < 180)
    }
    // phash must discriminate: at least half the images land on distinct anchors
    assert(anchors.distinct.size > 128, s"only ${anchors.distinct.size} distinct anchors")
  }

  test("phash is stable under lossy re-encode (perceptual property)") {
    var close = 0
    (0L until 32L).foreach { i =>
      val r = Images.generate(i)
      val img0 = Images.decode(r.bytes)
      val re = Images.decode(Images.encode(img0, "jpeg"))
      val hd = java.lang.Long.bitCount(Images.phash(img0) ^ Images.phash(re))
      if (hd <= 4) close += 1
    }
    assert(close >= 28, s"phash unstable: only $close/32 within hamming distance 4")
  }
}
