package graft.output

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Evaluation operators (M1/M2).
  *
  * M1 `evaluate` — knowledge-level P/R/F1 over (subj, pred, obj) sets with
  * the reference's empty-denominator conventions
  * (`/root/reference/iepy/utils.py:62-89`: precision=1.0 when nothing
  * predicted, recall=1.0 when gold empty).
  *
  * M2 `resultDict` — tp/fp/tn/fn + accuracy/precision/recall/F1 from
  * boolean predictions (`/root/reference/iepy/metrics.py:6-48`).
  */
object Metrics {

  final case class PRF1(
      correct: Long, predicted: Long, gold: Long,
      precision: Double, recall: Double, f1: Double)

  /** Distributed set intersection: one left-semi join + three counts. */
  def evaluate(predicted: DataFrame, gold: DataFrame): PRF1 = {
    val keys = Seq("subj", "pred", "obj")
    val p = predicted.select(keys.map(col): _*).distinct().persist()
    val g = gold.select(keys.map(col): _*).distinct().persist()
    val nP = p.count(); val nG = g.count()
    val correct = p.join(g, keys, "left_semi").count()
    p.unpersist(); g.unpersist()
    val prec = if (nP == 0) 1.0 else correct.toDouble / nP
    val rec = if (nG == 0) 1.0 else correct.toDouble / nG
    val f1 = if (prec + rec == 0) 0.0 else 2 * prec * rec / (prec + rec)
    PRF1(correct, nP, nG, prec, rec, f1)
  }

  /** Confusion counts in ONE aggregation pass (no per-cell scans). */
  def resultDict(spark: SparkSession, df: DataFrame,
      predictedCol: String = "predicted_label",
      realCol: String = "real_label"): DataFrame = {
    val p = col(predictedCol); val r = col(realCol)
    df.agg(
      sum(when(p && r, 1).otherwise(0)).as("tp"),
      sum(when(p && !r, 1).otherwise(0)).as("fp"),
      sum(when(!p && !r, 1).otherwise(0)).as("tn"),
      sum(when(!p && r, 1).otherwise(0)).as("fn"))
      .withColumn("accuracy",
        (col("tp") + col("tn")) /
          (col("tp") + col("tn") + col("fp") + col("fn")))
      .withColumn("precision",
        when(col("tp") + col("fp") === 0, lit(1.0))
          .otherwise(col("tp") / (col("tp") + col("fp"))))
      .withColumn("recall",
        when(col("tp") + col("fn") === 0, lit(1.0))
          .otherwise(col("tp") / (col("tp") + col("fn"))))
      .withColumn("f1",
        when(col("precision") + col("recall") === 0, lit(0.0))
          .otherwise(lit(2) * col("precision") * col("recall") /
            (col("precision") + col("recall"))))
  }
}
