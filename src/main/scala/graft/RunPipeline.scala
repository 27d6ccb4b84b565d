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
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val raw = CorpusGen.rawDocs(spark, sf)
    val triples = Pipeline.run(spark, raw, CorpusGen.gazette(sf)).persist()
    val nTriples = triples.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val prf = Metrics.evaluate(triples, CorpusGen.goldenTriples(spark, sf))
    outDir.foreach(d => Pipeline.materialize(spark, triples, d))
    println(f"""{"sf":$sf,"cores":"$cores","docs":${CorpusGen.numDocs(sf)},"triples":$nTriples,"seconds":$secs%.2f,"triples_per_sec":${nTriples / secs}%.1f,"precision":${prf.precision}%.4f,"recall":${prf.recall}%.4f,"f1":${prf.f1}%.4f}""")
    spark.stop()
  }
}
