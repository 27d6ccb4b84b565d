package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing with resume-by-anti-join (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Replaces the reference's `*_done_at` timestamps + "lacking" SQL filter
  * (`/root/reference/iepy/data/db.py:94-114`, SURVEY §4.1): presence of a
  * key in a COMMITTED batch of the stage's checkpoint IS done-ness. A
  * stage resume computes only the keys absent from committed batches
  * (left-anti join) and writes them as a NEW batch; finished work is
  * never recomputed.
  *
  * Crash-safety contract (object-store friendly):
  *  - each resume writes an append-only batch dir `batch_NNNNN`, never
  *    appending files into an existing dir;
  *  - a batch counts as committed ONLY once Spark's job-commit marker
  *    (_SUCCESS) exists — task files left by a crashed job live in a
  *    marker-less dir that no reader ever lists, so a rerun recomputes
  *    those keys into a fresh batch with no duplicates and no data loss;
  *  - batch indices are never reused (max over ALL dirs, committed or
  *    not), so garbage from a crash can be ignored or swept lazily.
  * All probes/listings go through the Hadoop FileSystem API ([[Fs]]),
  * so the same code runs on HDFS/S3A, not just local disk.
  *
  * Each committed batch also appends a `_manifest` JSON record with
  * per-partition row counts + key ranges — the lineage record the north
  * rule asks for.
  */
object Checkpoint {

  /** Committed (job-complete) batch dirs for `stage`, sorted. */
  def committedBatches(dir: String, stage: String): Seq[String] =
    Fs.listDirs(s"$dir/$stage", "batch_").filter(Fs.hasSuccess)

  /** Keys already completed for `stage`, or None if never run. */
  def completed(spark: SparkSession, dir: String, stage: String): Option[DataFrame] = {
    val batches = committedBatches(dir, stage)
    if (batches.isEmpty) None
    else Some(spark.read.parquet(batches: _*))
  }

  /** Run `stage` resumably: `compute` maps the missing keyed input rows
    * to output rows (must carry the same key column). Returns the full
    * checkpointed output. */
  def stage(
      spark: SparkSession,
      dir: String,
      stageName: String,
      keyCol: String,
      input: DataFrame,
      compute: DataFrame => DataFrame): DataFrame = {
    val path = s"$dir/$stageName"
    val (todo, hasCheckpoint) = completed(spark, dir, stageName) match {
      case Some(done) =>
        (input.join(done.select(col(keyCol)), Seq(keyCol), "left_anti"),
          true)
      case None => (input, false)
    }
    // emptiness checked on the anti-joined INPUT (cheap key scan), never
    // on compute's output — that would run the stage twice
    if (hasCheckpoint && todo.isEmpty) {
      // resume is a no-op, nothing recomputed
      spark.read.parquet(committedBatches(dir, stageName): _*)
    } else {
      val nextIdx = Fs.listDirs(path, "batch_")
        .map(p => p.substring(p.lastIndexOf('_') + 1).toInt)
        .maxOption.getOrElse(-1) + 1
      val batchPath = f"$path/batch_$nextIdx%05d"
      compute(todo).write.mode("errorifexists").parquet(batchPath)
      writeManifest(spark, dir, stageName, keyCol, nextIdx, batchPath)
      spark.read.parquet(committedBatches(dir, stageName): _*)
    }
  }

  /** Per-batch, per-partition lineage: row count + key range. */
  private def writeManifest(spark: SparkSession, dir: String,
      stageName: String, keyCol: String, batch: Int,
      batchPath: String): Unit = {
    val out = spark.read.parquet(batchPath)
      .groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
      .withColumn("stage", lit(stageName))
      .withColumn("batch", lit(batch))
    out.coalesce(1).write.mode("append")
      .json(s"$dir/_manifest/$stageName")
  }
}
