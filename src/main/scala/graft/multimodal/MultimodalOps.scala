package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, batch-shaped
  * per-partition processing, feature schema — is real and tested. IMAGE
  * decode is real ([[Codecs.decodeImage]], `javax.imageio` from the
  * JDK: true pixel dimensions + a pixel-derived luminance embedding).
  * AUDIO decode is real for formats the JDK parses
  * ([[Codecs.decodeAudio]], `javax.sound.sampled`: WAV/AIFF/AU PCM —
  * true sample rate + frame count + a Goertzel band-energy feature;
  * javax.sound discovers codecs via the SPI registry, so dropping an
  * MP3 SPI jar on the classpath extends the SAME code path to MP3 with
  * zero changes here). VIDEO decode is real for two containers:
  * animated GIF (`javax.imageio`) and uncompressed RGB24 AVI
  * ([[Codecs.decodeAviFrames]] — a pure-JDK RIFF walker; the DIB frame
  * payloads need no codec). Other containers (MP4/H.264 etc.) probe a
  * reflective javacv backend ([[ReflectiveVideoBackend]] — loaded via
  * Class.forName when `org.bytedeco:javacv` is on the classpath, absent
  * in this container) and otherwise fall back to clearly-marked
  * deterministic stubs ([[StubCodecs]]).
  *
  * Every features/frame row carries a `decoder` field ("imageio",
  * "javasound", "gif", "avi", "javacv", "stub") so downstream
  * training-data pipelines can FILTER stub-derived features instead of
  * silently training on hash noise.
  */
object MultimodalOps {

  /** One media asset row: the north-star "opaque binary + typed
    * metadata" column shape. */
  final case class Asset(
      asset_id: Long,
      doc_id: Long,
      modality: String, // image | audio | video
      bytes: Array[Byte],
      meta: Map[String, String])

  final case class ImageFeatures(
      asset_id: Long, width: Int, height: Int, channels: Int,
      embedding: Array[Float], decoder: String)

  final case class AudioFeatures(
      asset_id: Long, sample_rate: Int, n_samples: Int,
      mfcc: Array[Float], decoder: String)

  final case class FrameSample(
      asset_id: Long, frame_index: Int, frame_bytes: Array[Byte],
      decoder: String)

  /** Real codecs where the JDK ships one. Image decode is REAL
    * (`javax.imageio` handles PNG/JPEG/GIF/BMP with zero extra deps):
    * actual pixel dimensions, channel count, and a 16-dim grid-luminance
    * embedding from decoded pixels. Bytes that no registered reader
    * understands fall back to [[StubCodecs]] so synthetic/bench corpora
    * keep working — the fallback is the exception path, not the design. */
  object Codecs extends Serializable {
    /** Decode + featurize an image: (width, height, channels) from the
      * decoded raster, embedding = 4x4 grid of mean luminance (each cell
      * sampled on a bounded <=8x8 lattice so cost is O(1) per cell
      * regardless of image size — deterministic, no RNG). */
    def decodeImage(bytes: Array[Byte],
        meta: Map[String, String]): ImageFeatures = {
      val img =
        try javax.imageio.ImageIO.read(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (img == null) StubCodecs.decodeImage(bytes, meta)
      else {
        val w = img.getWidth
        val h = img.getHeight
        val ch = img.getColorModel.getNumComponents
        val emb = new Array[Float](16)
        var gy = 0
        while (gy < 4) {
          var gx = 0
          while (gx < 4) {
            val x0 = gx * w / 4
            val x1 = math.max(x0 + 1, (gx + 1) * w / 4)
            val y0 = gy * h / 4
            val y1 = math.max(y0 + 1, (gy + 1) * h / 4)
            val sx = math.max(1, (x1 - x0) / 8)
            val sy = math.max(1, (y1 - y0) / 8)
            var sum = 0.0
            var n = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) {
                val rgb = img.getRGB(x, y)
                sum += (((rgb >> 16) & 0xff) * 299 +
                  ((rgb >> 8) & 0xff) * 587 + (rgb & 0xff) * 114) / 1000.0
                n += 1
                x += sx
              }
              y += sy
            }
            emb(gy * 4 + gx) = (sum / n / 255.0).toFloat
            gx += 1
          }
          gy += 1
        }
        ImageFeatures(-1, w, h, ch, emb, "imageio")
      }
    }

    /** Decode + featurize audio the JDK can parse (WAV/AIFF/AU PCM via
      * `javax.sound.sampled` — no external codec libs): real sample
      * rate, real frame count, and a 13-band Goertzel spectral-energy
      * vector (the MFCC-slot analog) over a bounded window, so cost per
      * asset is O(window), not O(duration). Bytes no installed reader
      * understands (e.g. MP3) fall back to [[StubCodecs]]. */
    def decodeAudio(bytes: Array[Byte],
        meta: Map[String, String]): AudioFeatures = {
      import javax.sound.sampled.{AudioFormat, AudioSystem}
      val ais =
        try AudioSystem.getAudioInputStream(
          new java.io.ByteArrayInputStream(bytes))
        catch { case _: Exception => null }
      if (ais == null) StubCodecs.decodeAudio(bytes, meta)
      else try {
        val fmt = ais.getFormat
        val nFrames = ais.getFrameLength.toInt
        val sr = fmt.getSampleRate.toInt
        val frameSize = fmt.getFrameSize
        val enc = fmt.getEncoding
        val bits = fmt.getSampleSizeInBits
        // only encodings the branches below actually decode: 16-bit
        // SIGNED (the decode is two's-complement — unsigned 16-bit
        // would read silence as full-scale) and 8-bit signed/unsigned.
        // NOT_SPECIFIED (-1) lengths, mu-law/A-law companding and
        // 24/32-bit samples route to the stub rather than crash or emit
        // garbage spectra (the first byte of a frame is NOT the sample
        // for those encodings)
        val pcmOk =
          (bits == 16 && enc == AudioFormat.Encoding.PCM_SIGNED) ||
            (bits == 8 && (enc == AudioFormat.Encoding.PCM_SIGNED ||
              enc == AudioFormat.Encoding.PCM_UNSIGNED))
        if (nFrames < 0 || frameSize <= 0 || sr <= 0 || !pcmOk)
          return StubCodecs.decodeAudio(bytes, meta)
        // decode up to `window` frames to mono [-1,1] doubles;
        // 16384 frames bound the spectral pass regardless of duration
        val window = math.min(nFrames.toLong, 16384L).toInt
        val buf = new Array[Byte](window * frameSize)
        var off = 0
        var read = 0
        while (off < buf.length && read >= 0) {
          read = ais.read(buf, off, buf.length - off)
          if (read > 0) off += read
        }
        val frames = off / frameSize
        val big = fmt.isBigEndian
        val signed = enc == AudioFormat.Encoding.PCM_SIGNED
        val mono = new Array[Double](frames)
        var f = 0
        while (f < frames) {
          // first channel only: spectral shape, not stereo fidelity
          val base = f * frameSize
          mono(f) =
            if (bits == 16) {
              val lo = buf(base + (if (big) 1 else 0)) & 0xff
              val hi = buf(base + (if (big) 0 else 1))
              ((hi << 8) | lo) / 32768.0
            } else if (signed) buf(base) / 128.0
            else ((buf(base) & 0xff) - 128) / 128.0
          f += 1
        }
        // 13 Goertzel band energies at normalized freqs (i+1)/28 of
        // Nyquist, log-compressed — deterministic, window-bounded
        val feats = new Array[Float](13)
        var i = 0
        while (i < 13) {
          val w = math.Pi * (i + 1) / 28.0
          val coeff = 2.0 * math.cos(w)
          var s0 = 0.0; var s1 = 0.0; var s2 = 0.0
          var t = 0
          while (t < frames) {
            s0 = mono(t) + coeff * s1 - s2
            s2 = s1; s1 = s0
            t += 1
          }
          val power = s1 * s1 + s2 * s2 - coeff * s1 * s2
          feats(i) = math.log1p(power / math.max(1, frames)).toFloat
          i += 1
        }
        AudioFeatures(-1, sr, nFrames, feats, "javasound")
      } finally ais.close()
    }

    /** Real frame extraction, tried in order of decode fidelity:
      * animated GIF (`javax.imageio`), uncompressed RGB24 AVI
      * ([[decodeAviFrames]], pure-JDK RIFF walk), then the reflective
      * javacv backend when its jars are present. Every `every`-th frame
      * is decoded and re-encoded as standalone PNG bytes; the String is
      * the decoder label for the row's `decoder` field. Returns None
      * for bytes none of the real paths recognize so the caller can
      * fall back to [[StubCodecs]]. */
    def sampleFrames(bytes: Array[Byte],
        every: Int): Option[(String, Seq[Array[Byte]])] =
      sampleGifFrames(bytes, every).map(("gif", _))
        .orElse(decodeAviFrames(bytes, every).map(("avi", _)))
        .orElse(ReflectiveVideoBackend.sampleFrames(bytes, every)
          .map(("javacv", _)))

    private def sampleGifFrames(bytes: Array[Byte],
        every: Int): Option[Seq[Array[Byte]]] =
      try {
        val iis = javax.imageio.ImageIO.createImageInputStream(
          new java.io.ByteArrayInputStream(bytes))
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) { iis.close(); None }
        else {
          val reader = readers.next()
          if (!reader.getFormatName.equalsIgnoreCase("gif")) {
            iis.close(); None
          } else try {
            reader.setInput(iis)
            val n = reader.getNumImages(true)
            Some((0 until n by math.max(1, every)).map { i =>
              val frame = reader.read(i)
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(frame, "png", bos)
              bos.toByteArray
            })
          } finally { reader.dispose(); iis.close() }
        }
      } catch { case _: Exception => None }

    /** REAL video decode for uncompressed RGB24 AVI (biCompression=0,
      * the `DIB ` handler): the RIFF container is a length-prefixed
      * chunk tree and the `00db`/`00dc` payloads are raw bottom-up BGR
      * rasters — no codec needed, just the public RIFF/BITMAPINFOHEADER
      * layout. Every `every`-th frame becomes standalone PNG bytes.
      * None for anything that is not a RIFF/AVI with uncompressed
      * 24-bit frames (compressed AVIs route to the javacv seam/stub). */
    def decodeAviFrames(bytes: Array[Byte],
        every: Int): Option[Seq[Array[Byte]]] = {
      def u32(o: Int): Long =
        (bytes(o) & 0xffL) | ((bytes(o + 1) & 0xffL) << 8) |
          ((bytes(o + 2) & 0xffL) << 16) | ((bytes(o + 3) & 0xffL) << 24)
      def fourcc(o: Int): String =
        new String(bytes, o, 4, java.nio.charset.StandardCharsets.US_ASCII)
      if (bytes.length < 12 || fourcc(0) != "RIFF" || fourcc(8) != "AVI ")
        return None
      try {
        var width = 0; var height = 0; var bits = 0
        var compression = -1L
        val frames = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
        // walk the chunk tree: LIST chunks recurse, 'strf' carries the
        // BITMAPINFOHEADER, '00db'/'00dc' are frame payloads (in the
        // single-video-stream files this decoder supports)
        def walk(from: Int, to: Int): Unit = {
          var o = from
          while (o + 8 <= to) {
            val id = fourcc(o)
            val szL = u32(o + 4)
            val body = o + 8
            // reject malformed sizes up front, comparing in LONG: a u32
            // above 2^31 goes negative through .toInt and an Int
            // `body + sz` wraps for sz near 2^31 — either way a bogus
            // oversized frame would slip past an Int-arithmetic guard
            // (and the negative-size case would then step `o` backwards
            // into an unkillable executor loop)
            if (body.toLong + szL > bytes.length) return // malformed/truncated: stop
            val sz = szL.toInt // safe: bounded by bytes.length above
            if (id == "LIST" && sz >= 4) walk(body + 4, body + sz)
            else if (id == "strf" && sz >= 40 && compression == -1L) {
              // first strf: BITMAPINFOHEADER (biSize u32, biWidth s32,
              // biHeight s32, biPlanes u16, biBitCount u16,
              // biCompression u32, ...)
              width = u32(body + 4).toInt
              height = u32(body + 8).toInt
              bits = (u32(body + 12) >> 16).toInt & 0xffff
              compression = u32(body + 16)
            } else if ((id.endsWith("db") || id.endsWith("dc")) && sz > 0)
              frames += ((body, sz))
            val next = body + sz + (sz & 1) // chunks pad to even offsets
            if (next <= o) return // belt-and-braces: strict advance only
            o = next
          }
        }
        walk(12, bytes.length)
        if (compression != 0L || bits != 24 || width <= 0 || height <= 0 ||
            frames.isEmpty) return None
        val rowBytes = (width * 3 + 3) & ~3 // DIB rows pad to 4 bytes
        val expect = rowBytes * height
        Some(frames.zipWithIndex.toSeq
          .collect { case ((off, sz), i) if i % math.max(1, every) == 0 =>
            require(sz >= expect, s"frame $i: $sz bytes < expected $expect")
            val img = new java.awt.image.BufferedImage(width, height,
              java.awt.image.BufferedImage.TYPE_INT_RGB)
            var y = 0
            while (y < height) {
              // DIB rasters are BOTTOM-UP: file row y is image row
              // height-1-y; pixels are B,G,R triplets
              val row = off + y * rowBytes
              var x = 0
              while (x < width) {
                val b = bytes(row + x * 3) & 0xff
                val g = bytes(row + x * 3 + 1) & 0xff
                val r = bytes(row + x * 3 + 2) & 0xff
                img.setRGB(x, height - 1 - y, (r << 16) | (g << 8) | b)
                x += 1
              }
              y += 1
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            bos.toByteArray
          })
      } catch { case _: Exception => None }
    }
  }

  /** Classpath-probed javacv backend for containers the JDK cannot
    * decode (MP4/H.264/VP9...). Loaded reflectively so the library has
    * ZERO compile-time dependency on `org.bytedeco:javacv` — absent
    * jars mean [[available]] is false and callers fall through to the
    * stub; present jars light the path up with no code change. The
    * reflective surface is the minimal public FFmpegFrameGrabber +
    * Java2DFrameConverter API. */
  object ReflectiveVideoBackend extends Serializable {
    @transient lazy val grabberClass: Option[Class[_]] =
      try Some(Class.forName("org.bytedeco.javacv.FFmpegFrameGrabber"))
      catch { case _: Throwable => None }

    def available: Boolean = grabberClass.isDefined

    def sampleFrames(bytes: Array[Byte],
        every: Int): Option[Seq[Array[Byte]]] =
      grabberClass.flatMap(_ =>
        sampleFramesWith(Class.forName(_), bytes, every))

    /** The reflective plumbing with the class LOADER injected: no javacv
      * jars exist in this sandbox, so without this seam the grabber
      * lifecycle (construct from InputStream, start/grab/convert,
      * finally-release) would have zero executed coverage and a
      * classpath typo would fail silently into the stub. The spec
      * drives it with fake grabber/converter classes. */
    private[graft] def sampleFramesWith(load: String => Class[_],
        bytes: Array[Byte], every: Int): Option[Seq[Array[Byte]]] = {
        try {
          val cls = load("org.bytedeco.javacv.FFmpegFrameGrabber")
          val grabber = cls
            .getConstructor(classOf[java.io.InputStream])
            .newInstance(new java.io.ByteArrayInputStream(bytes))
          val convCls = load("org.bytedeco.javacv.Java2DFrameConverter")
          val conv = convCls.getConstructor().newInstance()
          val frameCls = load("org.bytedeco.javacv.Frame")
          val start = cls.getMethod("start")
          val grabImage = cls.getMethod("grabImage")
          val getImage = convCls.getMethod("getBufferedImage", frameCls)
          val out = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          try {
            start.invoke(grabber)
            var i = 0
            var frame = grabImage.invoke(grabber)
            while (frame != null) {
              if (i % math.max(1, every) == 0) {
                val img = getImage.invoke(conv, frame)
                  .asInstanceOf[java.awt.image.BufferedImage]
                if (img != null) {
                  val bos = new java.io.ByteArrayOutputStream()
                  javax.imageio.ImageIO.write(img, "png", bos)
                  out += bos.toByteArray
                }
              }
              i += 1
              frame = grabImage.invoke(grabber)
            }
          } finally {
            // release native FFmpeg state even when a mid-grab exception
            // is about to be mapped to None — otherwise every failing
            // asset leaks grabber resources, cumulative in a long-running
            // executor. stop + release/close are each best-effort.
            Seq("stop", "release", "close").foreach { m =>
              try cls.getMethod(m).invoke(grabber)
              catch { case _: Throwable => () }
            }
          }
          if (out.isEmpty) None else Some(out.toSeq)
        } catch { case _: Throwable => None }
    }
  }

  /** === STUB === deterministic stand-ins for codecs the JDK does NOT
    * ship (audio MFCC, video frames) plus the fallback for undecodable
    * image bytes. A production build replaces these bodies with actual
    * decode calls; signatures and output shapes are the contract. */
  object StubCodecs extends Serializable {
    private def h(bytes: Array[Byte], salt: Int): Long = {
      var x = 1125899906842597L + salt
      var i = 0
      while (i < bytes.length) { x = 31 * x + bytes(i); i += 1 }
      x
    }
    def decodeImage(bytes: Array[Byte], meta: Map[String, String]): ImageFeatures = {
      val w = meta.get("width").map(_.toInt).getOrElse(64)
      val hgt = meta.get("height").map(_.toInt).getOrElse(64)
      val emb = Array.tabulate(16)(i =>
        ((h(bytes, i) % 1000) / 1000.0f))
      ImageFeatures(-1, w, hgt, 3, emb, "stub")
    }
    def decodeAudio(bytes: Array[Byte], meta: Map[String, String]): AudioFeatures = {
      val sr = meta.get("sample_rate").map(_.toInt).getOrElse(16000)
      val mfcc = Array.tabulate(13)(i => ((h(bytes, 100 + i) % 1000) / 1000.0f))
      AudioFeatures(-1, sr, bytes.length, mfcc, "stub")
    }
    /** Every k-th fixed-size slice of the byte stream as a "frame". */
    def sampleFrames(bytes: Array[Byte], every: Int, frameSize: Int): Seq[Array[Byte]] =
      bytes.grouped(frameSize).zipWithIndex
        .collect { case (chunk, i) if i % every == 0 => chunk }
        .toSeq
  }

  /** Batch image feature extraction: per-partition map so a real decoder
    * would amortize model/codec init once per partition (the Scala analog
    * of a Pandas-UDF batch). Partitioning: repartition by asset_id hash
    * keeps batches balanced regardless of per-doc asset skew. */
  def imageFeatures(spark: SparkSession, assets: Dataset[Asset]): Dataset[ImageFeatures] = {
    import spark.implicits._
    assets.filter(_.modality == "image")
      .repartition(col("asset_id"))
      .mapPartitions { it =>
        // codec init amortizes ONCE per partition (ImageIO scans its
        // reader registry lazily; first decode in the JVM pays it)
        it.map { a =>
          Codecs.decodeImage(a.bytes, a.meta).copy(asset_id = a.asset_id)
        }
      }
  }

  def audioFeatures(spark: SparkSession, assets: Dataset[Asset]): Dataset[AudioFeatures] = {
    import spark.implicits._
    assets.filter(_.modality == "audio")
      .repartition(col("asset_id"))
      .mapPartitions(_.map { a =>
        Codecs.decodeAudio(a.bytes, a.meta).copy(asset_id = a.asset_id)
      })
  }

  /** Video frame sampling: flatMap — output can exceed input rows, so
    * this runs AFTER the repartition (never explodes a skewed input
    * partition further). Animated GIF and uncompressed AVI decode for
    * real ([[Codecs.sampleFrames]], PNG bytes per sampled frame), other
    * containers probe the javacv seam and then fall back to the
    * byte-slice stub — each row's `decoder` field says which path
    * produced it. */
  def sampleVideoFrames(spark: SparkSession, assets: Dataset[Asset],
      every: Int = 10, frameSize: Int = 256): Dataset[FrameSample] = {
    import spark.implicits._
    assets.filter(_.modality == "video")
      .repartition(col("asset_id"))
      .flatMap { a =>
        val (dec, frames) = Codecs.sampleFrames(a.bytes, every)
          .getOrElse(("stub",
            StubCodecs.sampleFrames(a.bytes, every, frameSize)))
        frames.zipWithIndex
          .map { case (f, i) => FrameSample(a.asset_id, i, f, dec) }
      }
  }

  /** Deterministic synthetic assets for tests/benches (no external
    * media). */
  def syntheticAssets(spark: SparkSession, n: Int, seed: Long = 42L): Dataset[Asset] = {
    import spark.implicits._
    spark.range(n).map { i =>
      val rnd = new java.util.Random(seed * 7919 + i)
      val modalities = Array("image", "audio", "video")
      val modality = modalities((i % 3).toInt)
      val bytes = new Array[Byte](512 + rnd.nextInt(512))
      rnd.nextBytes(bytes)
      Asset(i, i / 4, modality, bytes,
        Map("width" -> "128", "height" -> "96", "sample_rate" -> "22050"))
    }
  }
}
