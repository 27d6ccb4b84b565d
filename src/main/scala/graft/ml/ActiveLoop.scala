package graft.ml

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** C9: the interactive question loop recast as checkpointed batch rounds
  * (reference `/root/reference/iepy/instantiation/iepy_runner.py:157-180`).
  *
  * Each round:
  *   1. read the labels checkpoint (monotonically growing table)
  *   2. process(): threshold + train + rank sample + questions
  *   3. persist the round's questions; new answers (from a table the
  *      "annotator" appends to) fold into the labels checkpoint
  *
  * State round-trips through parquet, so the loop resumes mid-round after
  * a kill (the north rule's resumability applied to the AL state).
  */
object ActiveLoop {

  final case class RoundResult(
      round: Int,
      nLabeled: Long,
      nQuestions: Long,
      threshold: Option[Double])

  /** Run up to `maxRounds`, pulling answers from `answerOracle` (the
    * batch stand-in for the human: given the questions DF, returns
    * (evidence_id, label) answers for the top `answersPerRound`). */
  def run(
      spark: SparkSession,
      workDir: String,
      candidates: DataFrame,
      seedLabels: DataFrame,
      answerOracle: DataFrame => DataFrame,
      maxRounds: Int = 3,
      answersPerRound: Int = 10,
      tradeoff: Option[(Double, Double)] = None): Seq[RoundResult] = {
    val labelsPath = s"$workDir/labels"
    // a crash between swapInto's rename-aside and rename-into-place can
    // leave only labels_old on disk — restore before any read
    graft.pipeline.Fs.recoverSwap(labelsPath)
    if (!graft.pipeline.Fs.exists(labelsPath))
      seedLabels.write.mode("overwrite").parquet(labelsPath)

    (1 to maxRounds).map { round =>
      val labeled = spark.read.parquet(labelsPath)
      val unlabeled = candidates.join(
        labeled.select(col("evidence_id")), Seq("evidence_id"), "left_anti")
      val (state, questions) = ActiveLearning.process(
        spark, candidates.join(labeled, "evidence_id"),
        unlabeled, tradeoff)
      val qPath = s"$workDir/questions_r$round"
      questions.select(col("evidence_id"), col("uncertainty"))
        .limit(answersPerRound * 4)
        .write.mode("overwrite").parquet(qPath)

      // fold the "annotator's" answers into the labels checkpoint;
      // parquet read-back carries NO row order — re-sort by uncertainty
      // (deterministic evidence_id tiebreak) so the annotator sees the
      // top-N most uncertain questions, not an arbitrary file-order subset
      val answers = answerOracle(
        spark.read.parquet(qPath)
          .orderBy(col("uncertainty").asc, col("evidence_id").asc)
          .limit(answersPerRound))
      // NEWEST WINS: a re-answer of an already-labeled evidence replaces
      // the stored label (anti-join the old table against the answers,
      // then append the answers) — dropDuplicates kept an arbitrary row
      val newAnswers = answers.select(col("evidence_id"), col("label"))
      val updated = spark.read.parquet(labelsPath)
        .join(newAnswers.select(col("evidence_id")),
          Seq("evidence_id"), "left_anti")
        .unionByName(newAnswers)
      val tmp = labelsPath + "_tmp"
      updated.write.mode("overwrite").parquet(tmp)
      graft.pipeline.Fs.swapInto(tmp, labelsPath)

      RoundResult(round,
        spark.read.parquet(labelsPath).count(),
        spark.read.parquet(qPath).count(),
        state.threshold)
    }
  }
}
