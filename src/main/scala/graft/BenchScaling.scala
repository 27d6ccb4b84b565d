package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** N-vs-4N scaling measurement, drift-cancelling: both core counts run in
  * THIS JVM back-to-back in symmetric order (N, 4N, 4N, N), so any
  * slow linear drift of the sandbox VM's effective clock contributes
  * equally to both sides of the ratio. Prints one JSON line.
  *
  * Usage: BenchScaling [sf] [nCores]
  */
object BenchScaling {

  private def runOnce(cores: Int, sf: Double): Double = {
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-scaling")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val t0 = System.nanoTime()
      val (t, cl) = Pipeline.runWithCleanup(spark,
        CorpusGen.rawDocs(spark, sf), CorpusGen.gazette(sf))
      t.count()
      val secs = (System.nanoTime() - t0) / 1e9
      cl()
      secs
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.25)
    val n = args.lift(1).map(_.toInt).getOrElse(2)
    runOnce(n * 4, math.max(0.01, sf * 0.2)) // JIT/codegen warm-up
    val tA = runOnce(n, sf)
    val tB = runOnce(n * 4, sf)
    val tB2 = runOnce(n * 4, sf)
    val tA2 = runOnce(n, sf)
    val tN = (tA + tA2) / 2
    val t4N = (tB + tB2) / 2
    val eff = (tN / t4N) / 4.0
    println(f"""{"sf":$sf,"n":$n,"sec_n":$tN%.2f,"sec_4n":$t4N%.2f,"sec_n_runs":[$tA%.2f,$tA2%.2f],"sec_4n_runs":[$tB%.2f,$tB2%.2f],"scaling_efficiency":$eff%.3f}""")
  }
}
