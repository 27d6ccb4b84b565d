package graft

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._
import graft.pipeline.Checkpoint

/** North-rule resumability: kill/rerun recomputes nothing already
  * checkpointed; manifest carries per-partition lineage. */
class CheckpointSpec extends SparkSpec {

  test("stage resume computes only missing keys; finished work untouched") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt").toString
    val computeCalls = spark.sparkContext.longAccumulator("calls")

    def compute(df: org.apache.spark.sql.DataFrame) = {
      val acc = computeCalls
      df.as[(Long, String)].map { case (k, v) =>
        acc.add(1); (k, v.toUpperCase)
      }.toDF("k", "v")
    }

    // first run: half the input
    val half = spark.range(5).select($"id".as("k"),
      concat(lit("x"), $"id").as("v"))
    Checkpoint.stage(spark, dir, "upper", "k", half, compute)
    assert(computeCalls.value == 5)

    // resume with the FULL input: only the 5 new keys computed
    val full = spark.range(10).select($"id".as("k"),
      concat(lit("x"), $"id").as("v"))
    val out = Checkpoint.stage(spark, dir, "upper", "k", full, compute)
    assert(computeCalls.value == 10)
    assert(out.count() == 10)

    // third run, nothing missing: zero recompute
    Checkpoint.stage(spark, dir, "upper", "k", full, compute)
    assert(computeCalls.value == 10)

    // manifest exists with per-partition rows
    val manifest = spark.read.json(s"$dir/_manifest/upper")
    assert(manifest.agg(sum("rows")).head.getLong(0) == 10)
    assert(manifest.columns.toSet ==
      Set("partition", "rows", "min_key", "max_key", "stage"))
  }
}
