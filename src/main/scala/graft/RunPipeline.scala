package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.output.Metrics
import graft.pipeline.Pipeline

/** CLI entry: run the full KG pipeline on the synthetic corpus and report
  * triples + P/R vs the golden set. The spark-submit-shaped way into the
  * library (also what Bench drives).
  *
  * Usage: RunPipeline [sf] [cores] [outDir]
  */
object RunPipeline {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.001)
    val cores = args.lift(1).getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8"))
    val outDir = args.lift(2)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-kg-pipeline")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val benchOnly = outDir.contains("--bench")
    def once(): (Long, Double) = {
      val t0 = System.nanoTime()
      val (t, cl) = Pipeline.runWithCleanup(spark,
        CorpusGen.rawDocs(spark, sf), CorpusGen.gazette(sf))
      val n = t.count()
      val secs = (System.nanoTime() - t0) / 1e9
      cl()
      (n, secs)
    }
    if (benchOnly) {
      // one full-size warm-up (JIT + codegen cache for this exact plan
      // shape), then MIN of 3 timed runs — the sandbox VM shows +-30%
      // wall-time noise on identical configs; min isolates the code's
      // actual cost from interference
      once()
      val timed = (1 to 3).map(_ => once())
      val nTriples = timed.head._1
      val secs = timed.map(_._2).min
      println(f"""{"sf":$sf,"cores":"$cores","docs":${CorpusGen.numDocs(sf)},"triples":$nTriples,"seconds":$secs%.2f,"triples_per_sec":${nTriples / secs}%.1f}""")
      spark.stop()
      return
    }
    val t0 = System.nanoTime()
    val raw = CorpusGen.rawDocs(spark, sf)
    val (triples, cleanup) =
      Pipeline.runWithCleanup(spark, raw, CorpusGen.gazette(sf))
    val nTriples = triples.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val prf = Metrics.evaluate(triples, CorpusGen.goldenTriples(spark, sf))
    outDir.foreach(d => Pipeline.materialize(spark, triples, d))
    println(f"""{"sf":$sf,"cores":"$cores","docs":${CorpusGen.numDocs(sf)},"triples":$nTriples,"seconds":$secs%.2f,"triples_per_sec":${nTriples / secs}%.1f,"precision":${prf.precision}%.4f,"recall":${prf.recall}%.4f,"f1":${prf.f1}%.4f}""")
    cleanup()
    spark.stop()
  }
}
