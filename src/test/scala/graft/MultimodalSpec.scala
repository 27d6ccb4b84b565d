package graft

import graft.multimodal.MultimodalOps

/** Multimodal plumbing: schemas, batch shape, determinism. Image decode
  * is REAL (javax.imageio — see the PNG round-trip test); audio/video
  * decode remain documented stubs (no codec libs in this container). */
class MultimodalSpec extends SparkSpec {

  test("synthetic assets are deterministic and modality-partitioned") {
    val a = MultimodalOps.syntheticAssets(spark, 30).collect()
    val b = MultimodalOps.syntheticAssets(spark, 30).collect()
    assert(a.map(_.asset_id).toSeq == b.map(_.asset_id).toSeq)
    assert(a.zip(b).forall { case (x, y) => x.bytes.sameElements(y.bytes) })
    assert(a.map(_.modality).toSet == Set("image", "audio", "video"))
  }

  test("image features: fixed embedding dim, meta-driven dimensions") {
    val assets = MultimodalOps.syntheticAssets(spark, 30)
    val feats = MultimodalOps.imageFeatures(spark, assets).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.embedding.length == 16))
    assert(feats.forall(f => f.width == 128 && f.height == 96))
    // deterministic across runs
    val again = MultimodalOps.imageFeatures(spark,
      MultimodalOps.syntheticAssets(spark, 30)).collect()
    assert(feats.sortBy(_.asset_id).zip(again.sortBy(_.asset_id))
      .forall { case (x, y) => x.embedding.sameElements(y.embedding) })
  }

  test("real PNG bytes decode through ImageIO: true dims + pixel-derived embedding") {
    // build an actual encoded PNG in memory: 32x16, left half black,
    // right half white
    val img = new java.awt.image.BufferedImage(32, 16,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 32)
      img.setRGB(x, y, if (x < 16) 0x000000 else 0xffffff)
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val png = bos.toByteArray

    // direct decode: real dimensions (NOT the meta defaults), luminance
    // embedding dark on the left half, light on the right
    val f = MultimodalOps.Codecs.decodeImage(png, Map.empty)
    assert(f.width == 32 && f.height == 16 && f.channels == 3)
    assert(f.decoder == "imageio")
    assert(f.embedding.length == 16)
    for (row <- 0 until 4) {
      assert(f.embedding(row * 4) < 0.1,
        s"left cells should be dark: ${f.embedding.toSeq}")
      assert(f.embedding(row * 4 + 3) > 0.9,
        s"right cells should be light: ${f.embedding.toSeq}")
    }

    // through the Spark batch path: same values, asset_id attached
    import spark.implicits._
    val assets = Seq(MultimodalOps.Asset(7L, 1L, "image", png,
      Map("width" -> "999", "height" -> "999"))).toDS()
    val viaSpark = MultimodalOps.imageFeatures(spark, assets).collect()
    assert(viaSpark.length == 1)
    assert(viaSpark.head.asset_id == 7L)
    assert(viaSpark.head.width == 32 && viaSpark.head.height == 16)
    assert(viaSpark.head.embedding.sameElements(f.embedding))
  }

  test("undecodable bytes fall back to the documented stub (meta-driven dims)") {
    val junk = Array.fill[Byte](256)(42)
    val f = MultimodalOps.Codecs.decodeImage(junk,
      Map("width" -> "64", "height" -> "48"))
    assert(f.width == 64 && f.height == 48)
    assert(f.embedding.length == 16)
    assert(f.decoder == "stub",
      "stub-derived features must be filterable by the decoder field")
  }

  test("audio features carry sample-rate metadata and 13 MFCC slots") {
    val feats = MultimodalOps.audioFeatures(spark,
      MultimodalOps.syntheticAssets(spark, 30)).collect()
    assert(feats.nonEmpty)
    assert(feats.forall(_.mfcc.length == 13))
    assert(feats.forall(_.sample_rate == 22050))
  }

  test("real WAV bytes decode through javax.sound: exact rate/frames + spectral peak") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // an actual encoded WAV in memory: 16-bit mono PCM, 8000 Hz,
    // 4000 frames of a 1000 Hz sine
    val sr = 8000
    val n = 4000
    val pcm = new Array[Byte](n * 2)
    for (t <- 0 until n) {
      val v = (math.sin(2 * math.Pi * 1000.0 * t / sr) * 20000).toInt
      pcm(2 * t) = (v & 0xff).toByte // little-endian
      pcm(2 * t + 1) = ((v >> 8) & 0xff).toByte
    }
    val fmt = new AudioFormat(sr.toFloat, 16, 1, true, false)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, n),
      AudioFileFormat.Type.WAVE, bos)
    val wav = bos.toByteArray

    // real decode: exact sample rate and frame count (the stub would
    // report n_samples = wav.length incl. the 44-byte header — so exact
    // equality proves StubCodecs was NOT reached for WAV)
    val f = MultimodalOps.Codecs.decodeAudio(wav, Map.empty)
    assert(f.sample_rate == sr)
    assert(f.n_samples == n)
    assert(f.decoder == "javasound")
    assert(f.mfcc.length == 13)
    // band centers are (i+1)/56 * sampleRate; 1000 Hz lands on i=6
    val peak = f.mfcc.zipWithIndex.maxBy(_._1)._2
    assert(peak == 6, s"expected spectral peak in band 6: ${f.mfcc.toSeq}")

    // through the Spark batch path: same values, asset_id attached
    import spark.implicits._
    val assets = Seq(MultimodalOps.Asset(9L, 1L, "audio", wav,
      Map("sample_rate" -> "99999"))).toDS()
    val viaSpark = MultimodalOps.audioFeatures(spark, assets).collect()
    assert(viaSpark.length == 1)
    assert(viaSpark.head.asset_id == 9L)
    assert(viaSpark.head.sample_rate == sr &&
      viaSpark.head.n_samples == n)
    assert(viaSpark.head.mfcc.sameElements(f.mfcc))
  }

  test("animated GIF decodes to real PNG frames (every k-th sampled)") {
    import javax.imageio.{IIOImage, ImageIO}
    // an actual 6-frame animated GIF in memory: frame i is a solid
    // 20x10 image of a distinct grey level
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    val writer = ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    for (i <- 0 until 6) {
      val img = new java.awt.image.BufferedImage(20, 10,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g = (i * 40) & 0xff
      for (y <- 0 until 10; x <- 0 until 20)
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      writer.writeToSequence(new IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); ios.close(); writer.dispose()
    val gif = bos.toByteArray

    // direct decode: frames 0, 2, 4 as standalone PNGs with true dims
    val frames = MultimodalOps.Codecs.sampleFrames(gif, every = 2)
    assert(frames.isDefined, "GIF bytes must take the real decode path")
    assert(frames.get._1 == "gif")
    assert(frames.get._2.length == 3)
    frames.get._2.foreach { png =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 20 && img.getHeight == 10)
    }

    // through the Spark batch path
    import spark.implicits._
    val assets = Seq(MultimodalOps.Asset(11L, 1L, "video", gif,
      Map.empty[String, String])).toDS()
    val viaSpark = MultimodalOps
      .sampleVideoFrames(spark, assets, every = 2).collect()
    assert(viaSpark.length == 3)
    assert(viaSpark.map(_.frame_index).sorted.toSeq == Seq(0, 1, 2))
    assert(viaSpark.forall(_.decoder == "gif"))

    // non-GIF bytes decline the real path (stub fallback preserved)
    assert(MultimodalOps.Codecs
      .sampleFrames(Array.fill[Byte](64)(7), 2).isEmpty)
  }

  test("uncompressed RGB24 AVI decodes to real PNG frames (pure-JDK RIFF walk)") {
    import javax.imageio.ImageIO
    // hand-assemble a real 4-frame uncompressed AVI (RIFF spec layout):
    // 4x2 px, 24-bit DIB frames, top row red / bottom row blue so the
    // bottom-up raster flip is observable
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    def le16(v: Int): Array[Byte] =
      Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    def chunk(id: String, body: Array[Byte]): Array[Byte] =
      id.getBytes("US-ASCII") ++ le32(body.length) ++ body ++
        (if (body.length % 2 == 1) Array(0.toByte) else Array.empty[Byte])
    def list(typ: String, body: Array[Byte]): Array[Byte] =
      chunk("LIST", typ.getBytes("US-ASCII") ++ body)
    val (w, h) = (4, 2)
    val rowBytes = (w * 3 + 3) & ~3
    // BITMAPINFOHEADER: size, width, height, planes, bitcount=24,
    // compression=0 (BI_RGB), sizeImage, 4x reserved
    val strf = le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(rowBytes * h) ++ le32(0) ++ le32(0) ++ le32(0) ++
      le32(0)
    val strh = "vids".getBytes("US-ASCII") ++
      "DIB ".getBytes("US-ASCII") ++ new Array[Byte](48)
    // one DIB frame: BOTTOM-UP rows, BGR pixels — stored row 0 is the
    // image's bottom row (solid blue), stored row 1 the top (solid red)
    val frameBody =
      Array.fill(w)(Array[Byte](-1, 0, 0)).flatten ++        // blue row
        Array.fill(w)(Array[Byte](0, 0, -1)).flatten          // red row
    assert(frameBody.length == rowBytes * h)
    val movi = list("movi",
      (0 until 4).flatMap(_ => chunk("00db", frameBody)).toArray)
    val hdrl = list("hdrl", chunk("avih", new Array[Byte](56)) ++
      list("strl", chunk("strh", strh) ++ chunk("strf", strf)))
    val payload = "AVI ".getBytes("US-ASCII") ++ hdrl ++ movi
    val avi = "RIFF".getBytes("US-ASCII") ++ le32(payload.length) ++ payload

    // direct decode: frames 0 and 2, true dims, raster flipped upright
    val dec = MultimodalOps.Codecs.sampleFrames(avi, every = 2)
    assert(dec.isDefined, "uncompressed AVI must take the real decode path")
    assert(dec.get._1 == "avi")
    assert(dec.get._2.length == 2)
    dec.get._2.foreach { png =>
      val img = ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 4 && img.getHeight == 2)
      assert((img.getRGB(0, 0) & 0xffffff) == 0xff0000, "top row red")
      assert((img.getRGB(0, 1) & 0xffffff) == 0x0000ff, "bottom row blue")
    }

    // through the Spark batch path, decoder field carried per row
    import spark.implicits._
    val assets = Seq(MultimodalOps.Asset(13L, 1L, "video", avi,
      Map.empty[String, String])).toDS()
    val viaSpark = MultimodalOps
      .sampleVideoFrames(spark, assets, every = 2).collect()
    assert(viaSpark.length == 2)
    assert(viaSpark.forall(_.decoder == "avi"))

    // this container ships no javacv jars: the reflective seam reports
    // unavailable, and compressed/unknown containers fall to the stub
    // with the decoder field saying so
    assert(!MultimodalOps.ReflectiveVideoBackend.available)
    val junk = Seq(MultimodalOps.Asset(14L, 1L, "video",
      Array.fill[Byte](512)(9), Map.empty[String, String])).toDS()
    val stubbed = MultimodalOps
      .sampleVideoFrames(spark, junk, every = 2, frameSize = 128).collect()
    assert(stubbed.nonEmpty && stubbed.forall(_.decoder == "stub"))
  }

  test("javacv seam: reflective lifecycle executes against injected fakes") {
    import MultimodalOps.ReflectiveVideoBackend
    // sandbox truth: no javacv jars, live probe reports unavailable
    assert(!ReflectiveVideoBackend.available)

    // happy path: 5 fake frames, every=2 -> frames 0,2,4 as real PNGs;
    // start invoked once, stop+release invoked (the finally contract)
    FakeJavacv.reset()
    val got = ReflectiveVideoBackend.sampleFramesWith(
      FakeJavacv.loader(classOf[FakeJavacv.Grabber]),
      Array.fill[Byte](16)(1), every = 2)
    assert(got.isDefined, "the javacv branch must run when classes resolve")
    assert(got.get.length == 3)
    got.get.foreach { png =>
      val img = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(png))
      assert(img != null && img.getWidth == 2 && img.getHeight == 2)
      assert((img.getRGB(0, 0) & 0xffffff) == 0xff0000)
    }
    assert(FakeJavacv.started.get() == 1)
    assert(FakeJavacv.stopped.get() == 1, "stop not invoked")
    assert(FakeJavacv.released.get() == 1, "release not invoked")

    // error path: grabImage throws mid-stream -> None, AND the grabber
    // is still released (regression: stop/release used to be skipped on
    // the exception path, leaking native FFmpeg state per failing asset)
    FakeJavacv.reset()
    val failed = ReflectiveVideoBackend.sampleFramesWith(
      FakeJavacv.loader(classOf[FakeJavacv.ThrowingGrabber]),
      Array.fill[Byte](16)(1), every = 1)
    assert(failed.isEmpty)
    assert(FakeJavacv.stopped.get() == 1,
      "stop not invoked on the error path")
    assert(FakeJavacv.released.get() == 1,
      "release not invoked on the error path — native resources leak")

    // missing classes fall through to None (the stub fallback's input)
    assert(ReflectiveVideoBackend.sampleFramesWith(
      n => throw new ClassNotFoundException(n),
      Array.fill[Byte](16)(1), every = 1).isEmpty)
  }

  test("malformed AVI chunk sizes terminate the RIFF walk instead of hanging") {
    // Regression: a declared chunk size above 2^31 goes NEGATIVE through
    // u32(..).toInt (0xFFFFFFF8 -> -8), slipped past the truncation guard
    // (body + sz <= length) and made `o = body + sz + (sz & 1)` step to
    // exactly `o` again — an unkillable infinite loop inside the executor
    // task that the catch-to-None could never see (nothing throws).
    def le32(v: Int): Array[Byte] = Array((v & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 24) & 0xff).toByte)
    // top-level chunk declaring size 0xFFFFFFF8 (-8 as Int)
    val negChunk = "RIFF".getBytes("US-ASCII") ++ le32(72) ++
      "AVI ".getBytes("US-ASCII") ++
      "00db".getBytes("US-ASCII") ++ le32(0xFFFFFFF8) ++ new Array[Byte](64)
    // LIST recursion with the same poisoned size one level down
    val negList = "RIFF".getBytes("US-ASCII") ++ le32(84) ++
      "AVI ".getBytes("US-ASCII") ++
      "LIST".getBytes("US-ASCII") ++ le32(76) ++
      "movi".getBytes("US-ASCII") ++
      "00dc".getBytes("US-ASCII") ++ le32(0xFFFFFFF8) ++ new Array[Byte](64)
    val t0 = System.nanoTime()
    assert(MultimodalOps.Codecs.decodeAviFrames(negChunk, 1).isEmpty)
    assert(MultimodalOps.Codecs.decodeAviFrames(negList, 1).isEmpty)
    // and through the dispatching entry point (must fall to None, which
    // the Spark path then routes to the stub)
    assert(MultimodalOps.Codecs.sampleFrames(negChunk, 1).isEmpty)
    assert((System.nanoTime() - t0) / 1e9 < 10,
      "malformed AVI walk did not terminate promptly")
  }

  test("video frame sampling emits every k-th fixed-size frame") {
    val frames = MultimodalOps.sampleVideoFrames(spark,
      MultimodalOps.syntheticAssets(spark, 30), every = 2, frameSize = 100)
      .collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.frame_bytes.length <= 100))
    val perAsset = frames.groupBy(_.asset_id)
    perAsset.values.foreach { fs =>
      assert(fs.map(_.frame_index).sorted.toSeq ==
        (0 until fs.length).toSeq)
    }
  }
}
