package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scans and sinks (SURVEY §2.1).
  *
  * S1 corpus CSV scan, S2 gazette CSV scan, S4 name-file gazette, S5
  * predictions CSV sink, S6 predictions table upsert. Spark's csv reader
  * handles `.gz` transparently (as the reference's gzip path does,
  * `iepy/utils.py:96-99`).
  */
object Sources {

  /** S1: read a `document_id, document_text` CSV (plain or .gz), skip
    * malformed rows, dedupe by document_id FIRST WINS
    * (reference `iepy/utils.py:92-135`). First = file order, made
    * explicit here with an input-order tiebreak (monotonically increasing
    * id is per-partition ordered; the window min keeps the earliest). */
  def corpusCsv(spark: SparkSession, path: String): DataFrame = {
    val raw = spark.read
      .option("header", "true")
      .option("mode", "DROPMALFORMED")
      .csv(path)
      .select(col("document_id"), col("document_text"))
      .where(col("document_id").isNotNull &&
        col("document_text").isNotNull)
      .withColumn("_ord", monotonically_increasing_id())
    val w = Window.partitionBy(col("document_id")).orderBy(col("_ord"))
    raw.withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_ord", "_rn")
  }

  /** S2: read a `literal, class` gazette CSV; trim; duplicate literals
    * skipped — LAST wins to mirror the literal-NER map semantics
    * (reference `gazettes_loader.py:32-70`, `ner/literal.py:21-26`). */
  def gazetteCsv(spark: SparkSession, path: String): Seq[(String, String)] =
    spark.read.option("header", "true").csv(path)
      .select(trim(col("literal")).as("literal"),
        trim(col("class")).as("class"))
      .where(col("literal") =!= "")
      .collect()
      .map(r => (r.getString(0), r.getString(1)))
      .toSeq

  /** S4: literal-NER name files — one name per line, the i-th label tags
    * the i-th file; later files win on conflict
    * (reference `ner/literal.py:10-36`). Read through the Hadoop FS API
    * so gazette files can live next to the corpus (HDFS/S3A). */
  def nameFiles(labels: Seq[String], paths: Seq[String]): Seq[(String, String)] = {
    require(labels.length == paths.length)
    labels.zip(paths).flatMap { case (label, path) =>
      graft.pipeline.Fs.readString(path).linesIterator
        .map(_.trim).filter(_.nonEmpty).map(n => (n, label)).toList
    }
  }

  /** S3 normalizer: lowercase every word unless it is an acronym
    * (reference `iepy/preprocess/ner/literal.py:109-119`; the Freebase
    * download itself is an external service and out of scope). */
  def toLowerNormalizer(name: String): String =
    name.split(" ").map { w =>
      if (w.nonEmpty && w == w.toUpperCase && w.exists(_.isLetter)) w
      else w.toLowerCase
    }.mkString(" ")

  /** S5: predictions CSV sink — `(candidate evidence id, bool)` with
    * header; refuses overwrite (reference `iepy/data/output.py:8-24`). */
  def predictionsCsv(predictions: DataFrame, path: String): Unit =
    predictions
      .select(col("evidence_id").as("Candidate evidence id"),
        col("label").cast("string").as("Relation present"))
      .coalesce(1)
      .write.mode("errorifexists").option("header", "true").csv(path)

  /** S6: predictions table upsert — append machine labels with
    * `judge = "iepy-run on <ts>"`; idempotent via deterministic key
    * dedupe on (evidence, judge, relation) like the reference MERGE
    * (reference `iepy/data/output.py:27-31`, `models.py:652-660`). */
  def predictionsTable(spark: SparkSession, predictions: DataFrame,
      relation: String, dir: String, runTs: Long): Unit = {
    val judge = s"iepy-run on $runTs"
    val rows = predictions.select(
      col("evidence_id"),
      when(col("label"), "YE").otherwise("NO").as("label"),
      lit(relation).as("relation"),
      lit(judge).as("judge"),
      lit(true).as("by_machine"),
      lit(runTs).as("modification_ts"))
    // restore a table lost to a crash mid-swap before probing existence
    graft.pipeline.Fs.recoverSwap(dir)
    val merged =
      if (graft.pipeline.Fs.exists(dir)) {
        val existing = spark.read.parquet(dir)
        existing.unionByName(rows)
          .withColumn("_rn", row_number().over(
            Window.partitionBy(col("evidence_id"), col("judge"),
              col("relation"), col("by_machine"))
              .orderBy(col("modification_ts").desc)))
          .where(col("_rn") === 1).drop("_rn")
      } else rows
    // write-then-swap through the Hadoop FS API (works on HDFS/S3A;
    // java.io renameTo is local-disk-only)
    val tmp = dir + "_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    graft.pipeline.Fs.swapInto(tmp, dir)
  }
}
