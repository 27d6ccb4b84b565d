package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-stage checkpointing with resume-by-anti-join (north rule:
  * "resumable from checkpoint with per-partition lineage + metrics").
  *
  * Replaces the reference's `*_done_at` timestamps + "lacking" SQL filter
  * (`/root/reference/iepy/data/db.py:94-114`, SURVEY §4.1): presence of a
  * key in the stage's checkpoint table IS done-ness. A stage resume
  * computes only the keys absent from the checkpoint (left-anti join) and
  * appends them; finished work is never recomputed (kill/rerun = no-op on
  * completed keys).
  *
  * Each write also appends a `_manifest` JSON with per-partition row
  * counts + key ranges — the lineage record the north rule asks for.
  */
object Checkpoint {

  /** Keys already completed for `stage`, or None if never run. */
  def completed(spark: SparkSession, dir: String, stage: String): Option[DataFrame] = {
    val path = s"$dir/$stage"
    if (new java.io.File(path, "_SUCCESS").exists())
      Some(spark.read.parquet(path))
    else None
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
      spark.read.parquet(path) // resume is a no-op, nothing recomputed
    } else {
      compute(todo).write.mode("append").parquet(path)
      writeManifest(spark, dir, stageName, keyCol)
      spark.read.parquet(path)
    }
  }

  /** Per-partition lineage: row count + key range + write time. */
  private def writeManifest(spark: SparkSession, dir: String,
      stageName: String, keyCol: String): Unit = {
    val out = spark.read.parquet(s"$dir/$stageName")
      .groupBy(spark_partition_id().as("partition"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).as("min_key"),
        max(col(keyCol)).as("max_key"))
      .withColumn("stage", lit(stageName))
    out.coalesce(1).write.mode("overwrite")
      .json(s"$dir/_manifest/$stageName")
  }
}
