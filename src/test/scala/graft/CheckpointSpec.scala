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

  test("checkpointed pipeline: kill/rerun reuses extract batches, triples identical") {
    import graft.corpus.CorpusGen
    import graft.pipeline.Pipeline
    val sf = 0.0002
    val dir = Files.createTempDirectory("graft-ckpt-run").toString
    val gazette = CorpusGen.gazette(sf)
    val all = CorpusGen.rawDocs(spark, sf)
    val half = all.filter(d => d.path.length % 2 == 0)

    // run 1 "dies" after extract committed batch 0 (on half the corpus)
    val r1 = Pipeline.runCheckpointed(spark, half, gazette, dir)
    r1.triples.count()
    r1.cleanup()
    val batch0 = r1.newExtractBatch.get
    def batchFiles(b: String) = new java.io.File(
      b.stripPrefix("file:")).listFiles()
      .filter(_.getName.endsWith(".parquet"))
      .map(f => (f.getName, f.lastModified, f.length)).sortBy(_._1).toSeq
    val batch0Before = batchFiles(batch0)
    assert(batch0Before.nonEmpty)

    // rerun on the FULL corpus: batch 0 untouched, the new batch holds
    // exactly the docs batch 0 lacks
    val r2 = Pipeline.runCheckpointed(spark, all, gazette, dir)
    val triples2 = r2.triples
      .select("subj", "pred", "obj", "evidence_id").collect().toSet
    assert(r2.newExtractBatch.isDefined && r2.newExtractBatch.get != batch0)
    assert(batchFiles(batch0) == batch0Before,
      "committed batch 0 was rewritten on resume")
    val nAll = all.count()
    val nHalf = half.count()
    assert(spark.read.parquet(r2.newExtractBatch.get).count() == nAll - nHalf)
    r2.cleanup()

    // identical to the non-checkpointed run on the same corpus
    val (oneShot, cl) = Pipeline.runWithCleanup(spark, all, gazette)
    val expected = oneShot
      .select("subj", "pred", "obj", "evidence_id").collect().toSet
    cl()
    assert(triples2 == expected)

    // third run: resume is a no-op — nothing recomputed, no new batch
    val r3 = Pipeline.runCheckpointed(spark, all, gazette, dir)
    assert(r3.newExtractBatch.isEmpty)
    assert(r3.triples.count() == expected.size)
    r3.cleanup()
  }
}
