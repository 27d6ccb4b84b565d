package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for the training-data pipeline: image/audio/video
  * as opaque `binary` columns with typed metadata.
  *
  * The Spark-side plumbing — schema, partitioning, batch-shaped
  * per-partition processing, feature schema — is real and tested. The
  * actual media DECODE is a clearly-marked deterministic stub
  * ([[StubCodecs]]): this container ships no image/audio libraries, so
  * the stub derives bytes->features deterministically (content hash) with
  * the same shapes a real codec would produce. Swap [[StubCodecs]] for a
  * JNI/javacv-backed implementation without touching the pipeline.
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

  /** === STUB === deterministic stand-ins for real codecs. A production
    * build replaces these bodies with actual decode calls; signatures and
    * output shapes are the contract. */
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
        // real impl: init decoder/model ONCE here
        it.map { a =>
          StubCodecs.decodeImage(a.bytes, a.meta).copy(asset_id = a.asset_id)
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
