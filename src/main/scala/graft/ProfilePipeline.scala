package graft

import org.apache.spark.sql.SparkSession
import graft.corpus.CorpusGen
import graft.pipeline.Pipeline

/** Stage-level wall-clock profiler for the KG pipeline. */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sf = args.headOption.map(_.toDouble).getOrElse(0.1)
    val cores = args.lift(1).getOrElse("8")
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .config("spark.sql.shuffle.partitions", cores)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    import spark.implicits._
    val raw = CorpusGen.rawDocs(spark, sf)
    time("gen+count")(raw.count())
    time("tokenize-only")(
      raw.map(r => graft.preprocess.Tokenizer(r.content).tokens.length)
        .reduce(_ + _))
    time("preprocess-nocache")(
      Pipeline.preprocess(spark, raw, CorpusGen.gazette(sf))
        .map(_.mentions.length).reduce(_ + _))
    import org.apache.spark.sql.functions._
    val extracted = Pipeline.extract(spark, raw, CorpusGen.gazette(sf)).persist()
    time("extract+cache")(extracted.count())
    val ents = extracted.flatMap(_.entities)
      .groupBy($"entity_key")
      .agg(first($"kind").as("kind"), min($"alias").as("alias"),
        max($"from_gazette").as("from_gazette")).persist()
    time("entities")(ents.count())
    val canon = graft.canonical.Canonicalize.components(spark, ents).persist()
    time("cc-count")(canon.count())
    val preds = extracted.flatMap(_.predictions).toDF.filter($"answer")
    val k = canon.withColumnRenamed("entity_key", "k")
    time("joins")(preds
      .join(k.withColumnRenamed("canonical", "subj"), $"left_key" === $"k").drop("k")
      .join(k.withColumnRenamed("canonical", "obj"), $"right_key" === $"k").drop("k")
      .count())
    extracted.unpersist(); ents.unpersist(); canon.unpersist()
    val full = time("full-run") {
      Pipeline.run(spark, raw, CorpusGen.gazette(sf)).count()
    }
    val full2 = time("full-run-warm") {
      Pipeline.run(spark, raw, CorpusGen.gazette(sf)).count()
    }
    println(s"[profile] triples=$full/$full2")
    spark.stop()
  }
}
