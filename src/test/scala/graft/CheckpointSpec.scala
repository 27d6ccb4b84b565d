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

    // manifest exists with per-batch, per-partition rows
    val manifest = spark.read.json(s"$dir/_manifest/upper")
    assert(manifest.agg(sum("rows")).head.getLong(0) == 10)
    assert(manifest.columns.toSet ==
      Set("batch", "partition", "rows", "min_key", "max_key", "stage"))
    assert(manifest.select("batch").distinct().count() == 2)
  }

  test("uncommitted (crashed) batch dirs are invisible to resume") {
    import spark.implicits._
    val dir = Files.createTempDirectory("graft-ckpt2").toString
    val in = spark.range(3).select($"id".as("k"), $"id".as("v"))
    Checkpoint.stage(spark, dir, "s", "k", in, identity)
    // simulate a crashed job: task files present, no _SUCCESS marker
    val garbage = s"$dir/s/batch_00007"
    spark.range(100).select($"id".as("k"), $"id".as("v"))
      .write.parquet(garbage)
    graft.pipeline.Fs.deleteRecursive(s"$garbage/_SUCCESS")
    val out = Checkpoint.stage(spark, dir, "s", "k", in, identity)
    assert(out.count() == 3, "marker-less batch leaked into reads")
    // and the next real batch must not collide with the garbage index
    val more = spark.range(5).select($"id".as("k"), $"id".as("v"))
    assert(Checkpoint.stage(spark, dir, "s", "k", more, identity)
      .count() == 5)
    assert(Checkpoint.committedBatches(dir, "s")
      .exists(_.endsWith("batch_00008")))
  }
}
