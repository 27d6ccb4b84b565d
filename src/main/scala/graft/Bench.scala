package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Driver-run benchmark: one JSON line on stdout.
  *
  * Two parts:
  *  1. every SparkEntry query timed on SPARK_GRAFT_SF_DIR at
  *     local[SPARK_GRAFT_CPUS];
  *  2. the end-to-end KG pipeline (extract->link->canonicalize->
  *     materialize) on the SF=0.1 synthetic corpus at local[8] and
  *     local[32] — the sandbox stand-in for N vs 4N executors
  *     (BASELINE.md protocol). Reports triples/sec at both plus scaling
  *     efficiency; also refreshes BENCH/BASELINE.md.
  */
object Bench {

  private def session(cores: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def pipelineRun(cores: Int, sf: Double): (Long, Double) = {
    val spark = session(cores.toString)
    try {
      val t0 = System.nanoTime()
      val triples = Pipeline.run(spark,
        CorpusGen.rawDocs(spark, sf), CorpusGen.gazette(sf))
      val n = triples.count()
      (n, (System.nanoTime() - t0) / 1e9)
    } finally spark.stop()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val pipelineSf = sys.env.get("SPARK_GRAFT_PIPELINE_SF")
      .map(_.toDouble).getOrElse(0.1)

    // part 1: per-query timings on the driver tables
    val spark1 = session(cpus)
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        try { fn(spark1, sfDir).write.format("noop").mode("overwrite").save() }
        catch { case _: Throwable => () }
        name -> (System.nanoTime() - t0) / 1e9
    }
    spark1.stop()

    // part 2: KG pipeline at two parallelism levels (N vs 4N)
    val (n8, s8) = pipelineRun(8, pipelineSf)
    val (n32, s32) = pipelineRun(32, pipelineSf)
    val tput8 = n8 / s8
    val tput32 = n32 / s32
    val eff = (tput32 / tput8) / 4.0

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val extra =
      f""""pipeline_sf":$pipelineSf,"pipeline_triples":$n32,"pipeline_sec_8":$s8%.2f,"pipeline_sec_32":$s32%.2f,"triples_per_sec_8":$tput8%.1f,"triples_per_sec_32":$tput32%.1f,"scaling_efficiency":$eff%.3f"""
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,$extra,"sf":"$sfDir"}""")

    val md =
      f"""# BENCH — measured baseline (graft KG pipeline)
         |
         |Protocol per BASELINE.md: full pipeline (extract -> link ->
         |canonicalize -> materialize, incl. golden-corpus generation) on the
         |SF=$pipelineSf%.2f synthetic source-code corpus, identical input at two
         |parallelism levels (local[8] vs local[32]; sandbox stand-in for N
         |vs 4N executors). Correctness gate precedes: `sbt -batch test`
         |(P/R = 1.0 vs golden triples).
         |
         || config | triples | seconds | triples/sec |
         ||---|---|---|---|
         || local[8]  | $n8 | $s8%.2f | $tput8%.1f |
         || local[32] | $n32 | $s32%.2f | $tput32%.1f |
         |
         |scaling efficiency (tput32/tput8)/4 = **$eff%.3f** (gate: >= 0.8)
         |""".stripMargin
    try {
      Files.createDirectories(Paths.get("BENCH"))
      Files.writeString(Paths.get("BENCH/BASELINE.md"), md)
    } catch { case _: Throwable => () }
  }
}
