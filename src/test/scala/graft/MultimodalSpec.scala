package graft

import org.apache.spark.sql.functions._

import graft.operators.Multimodal

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("media table has the binary+metadata schema") {
    val m = Multimodal.mediaFromDocuments(spark, sf)
    def shape(s: org.apache.spark.sql.types.StructType) =
      s.fields.map(f => (f.name, f.dataType.simpleString)).toSeq
    assert(shape(m.schema) === shape(Multimodal.mediaSchema))
    val kinds = m.select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("image", "audio", "video"))
  }

  test("decode preserves rows and partitioning, deterministic features") {
    val m = Multimodal.mediaFromDocuments(spark, sf).repartition(3)
    val f1 = Multimodal.decode(m)
    assert(f1.schema === Multimodal.featureSchema)
    assert(f1.count() === m.count())
    assert(f1.rdd.getNumPartitions === 3, "batched decode must not shuffle")
    val c1 = f1.select($"media_id", $"checksum").as[(Long, Long)].collect().toMap
    val c2 = Multimodal.decode(m).select($"media_id", $"checksum")
      .as[(Long, Long)].collect().toMap
    assert(c1 === c2)
    // feature vectors are normalized byte histograms → sum ≈ 1
    val sums = f1.select(aggregate($"feature", lit(0.0d), (a, x) => a + x.cast("double")))
      .as[Double].collect()
    sums.foreach(s => assert(math.abs(s - 1.0) < 1e-3))
    // the synthesized text payloads are not parseable images → no dimensions
    assert(f1.filter($"width".isNotNull || $"height".isNotNull).count() === 0)
  }

  test("a real PNG decodes to true dimensions and a luminance histogram") {
    import java.awt.image.BufferedImage
    def png(w: Int, h: Int, rgb: Int): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", out)
      out.toByteArray
    }
    val m = Seq(
      (1L, "image", png(17, 9, 0xFFFFFF)),  // white → luminance bin 7
      (2L, "image", png(4, 4, 0x000000)),   // black → luminance bin 0
      (3L, "image", "not an image".getBytes("UTF-8")), // falls back to stub
      (4L, "audio", png(5, 5, 0x808080)))   // audio stays stubbed even if PNG
      .toDF("media_id", "kind", "bytes")
    val f = Multimodal.decode(m)
      .select($"media_id", $"width", $"height", $"feature")
      .as[(Long, Option[Int], Option[Int], Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    assert(f(1L)._2 === Some(17) && f(1L)._3 === Some(9))
    assert(f(1L)._4(7) === 1.0f) // every pixel in the brightest bin
    assert(f(2L)._2 === Some(4) && f(2L)._3 === Some(4))
    assert(f(2L)._4(0) === 1.0f)
    assert(f(3L)._2 === None && f(3L)._3 === None)
    assert(f(4L)._2 === None && f(4L)._3 === None)
  }

  test("a real WAV decodes to true sample rate, duration, amplitude histogram") {
    import javax.sound.sampled._
    // 8 kHz mono 16-bit PCM, 2000 frames = 250 ms of a loud square wave
    val frames = 2000
    val pcm = new Array[Byte](frames * 2)
    (0 until frames).foreach { i =>
      val v = if ((i / 8) % 2 == 0) 30000 else -30000 // |amp| lands in bin 7
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new AudioFormat(8000f, 16, 1, true, false)
    val out = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong),
      AudioFileFormat.Type.WAVE, out)
    val m = Seq(
      (1L, "audio", out.toByteArray),
      (2L, "audio", "not a wav".getBytes("UTF-8"))) // falls back to stub
      .toDF("media_id", "kind", "bytes")
    val f = Multimodal.decode(m)
      .select($"media_id", $"sample_rate", $"duration_ms", $"feature")
      .as[(Long, Option[Int], Option[Long], Seq[Float])].collect()
      .map(r => r._1 -> r).toMap
    assert(f(1L)._2 === Some(8000))
    assert(f(1L)._3 === Some(250L))
    assert(f(1L)._4(7) === 1.0f) // every sample in the loudest bin
    assert(f(2L)._2 === None && f(2L)._3 === None)
  }

  test("frameSample emits fixed-size frames for video only") {
    val m = Multimodal.mediaFromDocuments(spark, sf)
    val frames = Multimodal.frameSample(m, frameBytes = 16, stride = 2)
    val kinds = frames.join(m, "media_id").select($"kind").distinct().as[String].collect().toSet
    assert(kinds === Set("video"))
    val lens = frames.select(length($"frame_bytes")).as[Int].collect()
    assert(lens.forall(_ <= 16) && lens.exists(_ == 16))
  }

  /** A raw 4×2 clip with known pixels: frame 0 all-black, frame 1 all-white,
    * frame 2 mid-gray — luminance bins 0, 7, and 3 respectively. */
  private def knownClip: Array[Byte] = {
    import graft.operators.AviCodec
    val stride = AviCodec.rowStride(4)
    def solid(v: Int) = Array.fill(stride * 2)(v.toByte)
    AviCodec.encodeRaw(4, 2, 10, Seq(solid(0), solid(255), solid(110)))
  }

  test("videoFrames decodes a real raw AVI: true dims, count, luminance") {
    val m = Seq((7L, "video", knownClip)).toDF("media_id", "kind", "bytes")
    val f = Multimodal.videoFrames(m)
      .select($"frame_no", $"width", $"height", $"feature")
      .as[(Int, Int, Int, Seq[Float])].collect().sortBy(_._1)
    assert(f.map(_._1).toSeq === Seq(0, 1, 2))
    assert(f.forall(r => r._2 == 4 && r._3 == 2))
    assert(f(0)._4(0) === 1.0f) // black  → bin 0
    assert(f(1)._4(7) === 1.0f) // white  → bin 7
    assert(f(2)._4(3) === 1.0f) // 110    → bin 3
    // stride sampling: every 2nd frame
    val sampled = Multimodal.videoFrames(m, stride = 2)
      .select($"frame_no").as[Int].collect().sorted.toSeq
    assert(sampled === Seq(0, 2))
  }

  test("videoFrames decodes an MJPEG AVI via imageio") {
    import java.awt.image.BufferedImage
    import graft.operators.AviCodec
    def jpeg(rgb: Int): Array[Byte] = {
      val img = new BufferedImage(6, 4, BufferedImage.TYPE_INT_RGB)
      (0 until 4).foreach(y => (0 until 6).foreach(x => img.setRGB(x, y, rgb)))
      val out = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", out)
      out.toByteArray
    }
    val clip = AviCodec.encodeMjpeg(6, 4, 5, Seq(jpeg(0x000000), jpeg(0xFFFFFF)))
    val f = Multimodal.videoFrames(
      Seq((9L, "video", clip)).toDF("media_id", "kind", "bytes"))
      .select($"frame_no", $"width", $"height", $"feature")
      .as[(Int, Int, Int, Seq[Float])].collect().sortBy(_._1)
    assert(f.length === 2)
    assert(f.forall(r => r._2 == 6 && r._3 == 4))
    // JPEG is lossy but solid black/white survive to the extreme bins
    assert(f(0)._4(0) > 0.9f && f(1)._4(7) > 0.9f)
  }

  test("decode() fills real video metadata for AVI payloads, stub otherwise") {
    val m = Seq(
      (1L, "video", knownClip),
      (2L, "video", "h264 would live here".getBytes("UTF-8")))
      .toDF("media_id", "kind", "bytes")
    val f = Multimodal.decode(m)
      .select($"media_id", $"width", $"height", $"duration_ms")
      .as[(Long, Option[Int], Option[Int], Option[Long])].collect()
      .map(r => r._1 -> r).toMap
    assert(f(1L)._2 === Some(4) && f(1L)._3 === Some(2))
    assert(f(1L)._4 === Some(300L)) // 3 frames @ 10fps
    assert(f(2L)._2 === None && f(2L)._4 === None) // documented stub path
  }

  test("q58: synthesized clips decode back to their oracle structure") {
    val agg = Multimodal.q58FrameSample(spark, sf)
      .select($"media_id", $"n_frames", $"width", $"height")
      .as[(Long, Long, Int, Int)].collect()
    assert(agg.nonEmpty)
    val nChars = graft.sources.Tables.documents(spark, sf)
      .select($"doc_id", $"n_chars".cast("long")).as[(Long, Long)].collect().toMap
    agg.foreach { case (id, n, w, h) =>
      assert(w === 16 && h === 8)
      assert(n === ((nChars(id) % 5) + 3) / 2, s"media $id sampled-frame count")
    }
  }

  test("q157 audio features equal a pre-encode PCM replay (WAV round-trip)") {
    // decode()'s amplitude histogram must match one computed from the
    // samples BEFORE WAV encoding — PCM is stored verbatim in the container
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 3 === 1)
      .select($"doc_id", $"text", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect()
    val want = docs.map { case (id, text, nChars) =>
      val tb = text.getBytes("UTF-8")
      val n = ((nChars % 400) + 100).toInt
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        def b(j: Int) = if (tb.isEmpty) 0 else tb((i * 2 + j) % tb.length) & 0xFF
        val amp = math.abs((b(1).toByte.toInt << 8) | b(0))
        hist(math.min(amp >> 12, 7)) += 1
        i += 1
      }
      id -> hist.map(_.toFloat / n).toSeq
    }.toMap
    val got = operators.Multimodal
      .decode(operators.Multimodal.audioFromDocuments(spark, sf))
      .filter($"sample_rate".isNotNull)
      .select($"media_id", $"feature").as[(Long, Seq[Float])].collect().toMap
    assert(got === want)
    assert(got.nonEmpty)
  }

  test("q154 image near-dup equals a pre-encode pixel replay (PNG round-trip)") {
    // recompute every image's luminance histogram from the ORIGINAL text
    // bytes (the pixels BEFORE PNG encoding); PNG is lossless, so the
    // operator's decoded histograms must match and so must the pair set
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 3 === 0)
      .select($"doc_id", $"text").as[(Long, String)].collect()
    def hist(text: String): Array[Float] = {
      val tb = text.getBytes("UTF-8")
      val h = new Array[Long](8)
      var p = 0
      while (p < 256) {
        def b(i: Int) = if (tb.isEmpty) 0 else tb((p * 3 + i) % tb.length) & 0xFF
        val lum = (b(0) * 299 + b(1) * 587 + b(2) * 114) / 1000
        h(lum >> 5) += 1
        p += 1
      }
      h.map(_ / 256f)
    }
    val feats = docs.map { case (id, t) => id -> hist(t) }
    val withBin = feats.map { case (id, f) =>
      (id, f, f.indexOf(f.max)) // first max — array_position semantics
    }
    val want = (for {
      i <- withBin.indices; j <- i + 1 until withBin.length
      (da, fa, ba) = withBin(i); (db, fb, bb) = withBin(j)
      if ba == bb
      l1 = fa.zip(fb).map { case (x, y) => math.abs(x.toDouble - y.toDouble) }.sum
      if l1 <= 0.02
    } yield {
      val (lo, hi) = if (da < db) (da, db) else (db, da)
      (lo, hi, ba.toLong + 1, l1)
    }).toSet
    val got = operators.Multimodal.q154ImageNearDup(spark, sf)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(got === want)
    assert(got.nonEmpty, "corpus must contain near-dup images")
  }

  test("q206: containers really carry WAVE format code 7/6 (μ-law/A-law)") {
    // parse the RIFF fmt chunk by hand — if the synthesis silently fell
    // back to PCM (code 1) the "companded decode" test would prove nothing
    def fmtCode(b: Array[Byte]): Int = {
      var i = 12
      while (i + 8 <= b.length) {
        val id = new String(b, i, 4, "US-ASCII")
        val len = (b(i + 4) & 0xFF) | ((b(i + 5) & 0xFF) << 8) |
          ((b(i + 6) & 0xFF) << 16) | ((b(i + 7) & 0xFF) << 24)
        if (id == "fmt ") return (b(i + 8) & 0xFF) | ((b(i + 9) & 0xFF) << 8)
        i += 8 + len + (len & 1)
      }
      -1
    }
    val u = Multimodal.compandedAudioFromDocuments(spark, sf)
      .select($"bytes").as[Array[Byte]].head()
    val a = Multimodal.compandedAudioFromDocuments(spark, sf, aLaw = true)
      .select($"bytes").as[Array[Byte]].head()
    assert(fmtCode(u) === 7, "μ-law container must use WAVE format code 7")
    assert(fmtCode(a) === 6, "A-law container must use WAVE format code 6")
  }

  test("q206 companded decode approximates the pre-encode PCM amplitudes") {
    // G.711 is lossy but coarse-bin histograms survive: every decoded
    // 8-bin amplitude histogram must sit within a small L1 distance of the
    // exact pre-encode PCM histogram (header-only parsing would return an
    // empty/zero histogram and fail this)
    val docs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 3 === 1)
      .select($"doc_id", $"text", $"n_chars".cast("long"))
      .as[(Long, String, Long)].collect()
    val want = docs.map { case (id, text, nChars) =>
      val tb = text.getBytes("UTF-8")
      val n = ((nChars % 400) + 100).toInt
      val hist = new Array[Long](8)
      var i = 0
      while (i < n) {
        def b(j: Int) = if (tb.isEmpty) 0 else tb((i * 2 + j) % tb.length) & 0xFF
        val amp = math.abs((b(1).toByte.toInt << 8) | b(0))
        hist(math.min(amp >> 12, 7)) += 1
        i += 1
      }
      id -> hist.map(_.toFloat / n).toSeq
    }.toMap
    for (aLaw <- Seq(false, true)) {
      val got = Multimodal
        .decode(Multimodal.compandedAudioFromDocuments(spark, sf, aLaw))
        .filter($"sample_rate".isNotNull)
        .select($"media_id", $"feature").as[(Long, Seq[Float])]
        .collect().toMap
      assert(got.keySet === want.keySet)
      got.foreach { case (id, h) =>
        val l1 = h.zip(want(id)).map { case (x, y) => math.abs(x - y) }.sum
        assert(l1 <= 0.12f, s"media $id aLaw=$aLaw drifted l1=$l1")
      }
      assert(got.nonEmpty)
    }
  }

  test("q228 resize: every output pixel is the exact block mean of the source") {
    def pixels(b: Array[Byte]): (Int, Int, Array[Int]) = {
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(b))
      val w = img.getWidth; val h = img.getHeight
      (w, h, Array.tabulate(w * h)(p => img.getRGB(p % w, p / w) & 0xFFFFFF))
    }
    val src = Multimodal.imagesFromDocuments(spark, sf)
      .select($"media_id", $"bytes").as[(Long, Array[Byte])]
      .collect().toMap
    val out = Multimodal.resizeImages(Multimodal.imagesFromDocuments(spark, sf))
      .select($"media_id", $"dst_w", $"dst_h", $"bytes")
      .as[(Long, Int, Int, Array[Byte])].collect()
    assert(out.length === src.size)
    out.foreach { case (id, dw, dh, b) =>
      val (ow, oh, op) = pixels(b)
      assert((ow, oh) === ((dw, dh)))
      val (sw, _, sp) = pixels(src(id))
      for (y <- 0 until dh; x <- 0 until dw) {
        var r = 0; var g = 0; var bl = 0
        for (dy <- 0 until 2; dx <- 0 until 2) {
          val p = sp((y * 2 + dy) * sw + (x * 2 + dx))
          r += (p >> 16) & 0xFF; g += (p >> 8) & 0xFF; bl += p & 0xFF
        }
        val want = ((r / 4) << 16) | ((g / 4) << 8) | (bl / 4)
        assert(op(y * dw + x) === want, s"media $id pixel ($x,$y)")
      }
    }
  }

  test("q206 recovers rate and duration from the companded containers") {
    val got = Multimodal.q206CompandedAudio(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    val nDocs = graft.sources.Tables.documents(spark, sf)
      .filter($"doc_id" % 3 === 1).count()
    assert(got.length === 2 * nDocs, "every doc must decode in both arms")
    assert(got.forall(_._3 == 8000L))
  }

  test("scene cuts replay definitionally from the decoded frames") {
    val th = 0.25
    val got = Multimodal.q312SceneCuts(spark, sf, threshold = th)
      .as[(Long, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got.nonEmpty)

    // definitional replay: same decoded frames, L1s folded in plain Scala
    val frames = Multimodal
      .videoFrames(Multimodal.videoFromDocuments(spark, sf), stride = 1)
      .select($"media_id", $"frame_no", $"feature")
      .as[(Long, Int, Seq[Float])].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3)).toMap
    assert(frames.keySet === got.keySet)
    frames.foreach { case (id, fs) =>
      val l1s = fs.sliding(2).filter(_.length == 2).map { w =>
        // mirror the plan's fold: per-bin float abs-diff, left-to-right
        // double accumulation
        w(0).zip(w(1)).foldLeft(0.0) { case (acc, (x, y)) =>
          acc + math.abs(x - y).toDouble }
      }.toSeq
      val (nf, nc, mj) = got(id)
      assert(nf === fs.length.toLong)
      assert(nc === l1s.count(_ > th).toLong, s"cut count for clip $id")
      if (l1s.nonEmpty) assert(mj === Some(l1s.max), s"max jump for $id")
      else assert(mj.isEmpty)
    }
    // the fixture must exercise both branches: some cut somewhere, and
    // at least one quiet clip
    val cuts = got.values.map(_._2).sum
    assert(cuts > 0L, "threshold produced no cuts anywhere — degenerate")
    assert(got.values.exists(_._2 == 0L), "no quiet clip in fixture")
  }
}
