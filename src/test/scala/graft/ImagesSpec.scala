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

  test("video container: deterministic, parses back, frame-sample decodes bit-exact") {
    import graft.img.Videos
    (0L until 20L).foreach { idx =>
      val v1 = Videos.generate(idx)
      val v2 = Videos.generate(idx)
      assert(java.util.Arrays.equals(v1.bytes, v2.bytes))
      assert(v1.n_frames == Videos.frameCount(idx) && v1.n_frames >= 4 && v1.n_frames <= 11)
      val fs = Videos.frames(v1.bytes)
      assert(fs.length == v1.n_frames)
      // stride-k sampling: count arithmetic + indexes + lossless decode
      Seq(1, 2, 3, 5).foreach { k =>
        val sampled = Videos.sampleFrames(v1.bytes, k)
        assert(sampled.size == (v1.n_frames + k - 1) / k, s"idx=$idx k=$k")
        assert(sampled.map(_._1) == (0 until v1.n_frames by k))
        sampled.foreach { case (f, img) =>
          assert(img.getWidth == v1.w && img.getHeight == v1.h)
          assert(graft.img.Images.psnr(img,
            graft.img.Images.renderPixels(Videos.frameSeed(idx, f), v1.w, v1.h)).isInfinite,
            s"frame $f of video $idx not bit-exact")
        }
      }
    }
    // malformed containers reject with GeoqException, never EOF/allocation
    assertThrows[graft.core.GeoqException](Videos.frames(Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)))
    val good = Videos.generate(3L).bytes
    assertThrows[graft.core.GeoqException](Videos.frames(good.take(good.length / 2))) // truncated mid-frame
    assertThrows[graft.core.GeoqException](Videos.frames(good.take(6)))               // truncated header
    val negCount = good.clone(); negCount(4) = 0xFF.toByte // frame count high byte
    assertThrows[graft.core.GeoqException](Videos.frames(negCount))
    val hugeLen = good.clone(); hugeLen(8) = 0x7F.toByte   // first frame length high byte
    assertThrows[graft.core.GeoqException](Videos.frames(hugeLen))
  }

  test("audio WAV container: canonical header, lossless round-trip, exact features") {
    import graft.img.Audio
    (0L until 20L).foreach { idx =>
      val a = Audio.generate(idx)
      // canonical 44-byte header + 2 bytes/sample
      assert(a.bytes.length == 44 + 2 * a.n_samples)
      assert(new String(a.bytes.slice(0, 4), "US-ASCII") == "RIFF")
      assert(new String(a.bytes.slice(8, 12), "US-ASCII") == "WAVE")
      val (rate, samples) = Audio.decodeWav(a.bytes)
      assert(rate == Audio.RATE && samples.length == a.n_samples)
      assert(samples.toSeq == (0 until a.n_samples).map(i => Audio.sample(idx, i)))
      val (n, sumAbs, zc) = Audio.features(samples)
      assert(n == a.n_samples && sumAbs > 0 && zc >= 0)
    }
    assertThrows[graft.core.GeoqException](
      Audio.decodeWav("notawavfilenotawavfilenotawavfilenotawavfile".getBytes))
    // truncated payload / corrupt data length reject, never underflow or
    // silently decode as an empty clip
    val wav = Audio.generate(3L).bytes
    assertThrows[graft.core.GeoqException](Audio.decodeWav(wav.take(100)))
    val negLen = wav.clone(); negLen(43) = 0xFF.toByte // data length high byte
    assertThrows[graft.core.GeoqException](Audio.decodeWav(negLen))
  }

  test("container fuzz: every truncation point rejects with GeoqException, never leaks raw errors") {
    import graft.img.{Audio, Videos}
    val vid = Videos.generate(7L).bytes
    val wav = Audio.generate(7L).bytes
    val rnd = new scala.util.Random(7)
    // all short prefixes + a random sample of longer ones
    def cuts(len: Int): Seq[Int] =
      (0 until math.min(len, 64)) ++ Seq.fill(200)(rnd.nextInt(len))
    cuts(vid.length).foreach { k =>
      if (k < vid.length) {
        val e = intercept[Exception](Videos.frames(vid.take(k)))
        assert(e.isInstanceOf[graft.core.GeoqException], s"video cut=$k threw ${e.getClass}")
      }
    }
    cuts(wav.length).foreach { k =>
      if (k < wav.length) {
        val e = intercept[Exception](Audio.decodeWav(wav.take(k)))
        assert(e.isInstanceOf[graft.core.GeoqException], s"wav cut=$k threw ${e.getClass}")
      }
    }
    // random single-byte corruptions parse fully or reject cleanly (image
    // payload corruptions may still parse: lengths can remain consistent)
    (0 until 100).foreach { _ =>
      val b = vid.clone(); b(rnd.nextInt(b.length)) = rnd.nextInt(256).toByte
      try { Videos.frames(b); () }
      catch {
        case _: graft.core.GeoqException => ()
        case e: Throwable => fail(s"video corruption threw ${e.getClass}")
      }
    }
    // the FULL q52 path (parse + ImageIO decode) under payload corruption:
    // a structurally-consistent container with mangled PNG bytes must
    // reject with GeoqException (not a raw IIOException), and the pooled
    // thread-local reader must stay usable for the next good decode
    (0 until 100).foreach { _ =>
      val b = vid.clone()
      b(16 + rnd.nextInt(b.length - 16)) = rnd.nextInt(256).toByte // keep header
      try { Videos.sampleFrames(b, 1); () }
      catch {
        case _: graft.core.GeoqException => ()
        case e: Throwable => fail(s"decode corruption threw ${e.getClass}: ${e.getMessage}")
      }
      assert(Videos.sampleFrames(vid, 3).nonEmpty) // reader recovered
    }
  }

  test("near-dup twin: re-encoded dropped-frame twin shares bit-exact decoded leading frames") {
    import graft.img.{Images, Videos}
    for (idx <- Seq(0L, 5L, 10L)) {
      val v = Videos.generate(idx)
      val t = Videos.twin(v, idx)
      assert(t.n_frames == v.n_frames - 1)
      assert(t.video_id == f"vid${idx + Videos.TWIN_OFFSET}%09d")
      val vf = Videos.frames(v.bytes)
      val tf = Videos.frames(t.bytes)
      assert(tf.length == vf.length - 1)
      // every shared frame position decodes to the IDENTICAL pixel field
      // (PNG lossless — the q54 provable-recall anchor) and hence carries
      // identical phash band keys and pixel-MD5 refine keys
      tf.indices.foreach { i =>
        val a = Images.decode(vf(i)); val b = Images.decode(tf(i))
        assert(Images.psnr(a, b).isInfinite, s"frame $i pixels diverged")
        assert(Images.phash(a) == Images.phash(b))
        assert(Images.pixelMd5(a) == Images.pixelMd5(b))
      }
      // distinct frames have distinct pixel ids (refine really separates)
      assert(Images.pixelMd5(Images.decode(vf(0))) !=
        Images.pixelMd5(Images.decode(vf(1))))
    }
  }
}
