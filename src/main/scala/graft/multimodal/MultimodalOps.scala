package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, batch-shaped
  * per-partition processing, feature schema — is real and tested. IMAGE
  * decode is also real ([[Codecs.decodeImage]], `javax.imageio` from the
  * JDK: true pixel dimensions + a pixel-derived luminance embedding).
  * AUDIO/VIDEO decode remain clearly-marked deterministic stubs
  * ([[StubCodecs]]): this container ships no audio/video codec
  * libraries, so the stubs derive bytes->features deterministically
  * (content hash) with the same shapes a real codec would produce. Swap
  * [[StubCodecs]] for a JNI/javacv-backed implementation without
  * touching the pipeline.
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
      embedding: Array[Float])

  final case class AudioFeatures(
      asset_id: Long, sample_rate: Int, n_samples: Int,
      mfcc: Array[Float])

  final case class FrameSample(
      asset_id: Long, frame_index: Int, frame_bytes: Array[Byte])

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
        ImageFeatures(-1, w, h, ch, emb)
      }
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
      ImageFeatures(-1, w, hgt, 3, emb)
    }
    def decodeAudio(bytes: Array[Byte], meta: Map[String, String]): AudioFeatures = {
      val sr = meta.get("sample_rate").map(_.toInt).getOrElse(16000)
      val mfcc = Array.tabulate(13)(i => ((h(bytes, 100 + i) % 1000) / 1000.0f))
      AudioFeatures(-1, sr, bytes.length, mfcc)
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
        StubCodecs.decodeAudio(a.bytes, a.meta).copy(asset_id = a.asset_id)
      })
  }

  /** Video frame sampling: flatMap — output can exceed input rows, so
    * this runs AFTER the repartition (never explodes a skewed input
    * partition further). */
  def sampleVideoFrames(spark: SparkSession, assets: Dataset[Asset],
      every: Int = 10, frameSize: Int = 256): Dataset[FrameSample] = {
    import spark.implicits._
    assets.filter(_.modality == "video")
      .repartition(col("asset_id"))
      .flatMap { a =>
        StubCodecs.sampleFrames(a.bytes, every, frameSize).zipWithIndex
          .map { case (f, i) => FrameSample(a.asset_id, i, f) }
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
