package graft.labels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Label aggregation + conflict resolution (Q5, reference
  * `/root/reference/iepy/data/db.py:249-311`).
  *
  * Input: labels DF with columns (evidence_id, label in {YE,NO,SK,NS},
  * relation, judge, by_machine, modification_ts).
  * Output: (evidence_id, label: boolean) for informative evidence only.
  *
  * Semantics preserved:
  *  - only human YE/NO/NS labels considered (SK and machine labels out)
  *  - one answer -> it; several but unanimous -> it
  *  - conflict -> solver; no solver / unsolved -> dropped
  *  - NS (nonsense) -> uninformative, dropped
  *
  * One aggregation pass; solvers are algebraic (max_by/min_by) so the
  * whole thing is a single shuffle with map-side combine.
  */
object LabelResolve {

  sealed trait ConflictSolver
  case object NoSolver extends ConflictSolver
  /** newest `modification_ts` wins (`db.py:308-311`) */
  case object NewestWins extends ConflictSolver
  /** earliest judge in the given order wins; labels from unknown judges
    * ignored (`db.py:296-306`) */
  final case class JudgePriority(judges: Seq[String]) extends ConflictSolver

  def resolve(labels: DataFrame, relation: String,
      solver: ConflictSolver = NoSolver): DataFrame = {
    val informative = labels
      .filter(col("relation") === relation && !col("by_machine") &&
        col("label").isin("YE", "NO", "NS"))

    val resolvedLabel = solver match {
      case NoSolver =>
        // unanimous only: countDistinct == 1
        when(countDistinct(col("label")) === 1, first(col("label")))
      case NewestWins =>
        when(countDistinct(col("label")) === 1, first(col("label")))
          .otherwise(max_by(col("label"), col("modification_ts")))
      case JudgePriority(_) =>
        // handled below via pre-filter + rank column
        when(countDistinct(col("label")) === 1, first(col("label")))
          .otherwise(min_by(col("label"), col("judge_rank")))
    }

    val prepared = solver match {
      case JudgePriority(judges) =>
        val rank = array_position(
          array(judges.map(lit): _*), col("judge"))
        // single-answer / unanimity must consider ALL answers, but the
        // solver itself only ranked judges -> compute both over the full
        // group, with unknown judges ranked after every known one
        informative.withColumn("judge_rank",
          when(rank === 0, lit(Long.MaxValue)).otherwise(rank))
      case _ => informative
    }

    prepared.groupBy(col("evidence_id"))
      .agg(resolvedLabel.as("lbl"),
        (solver match {
          case JudgePriority(_) =>
            min(col("judge_rank")) =!= Long.MaxValue ||
              countDistinct(col("label")) === 1
          case NoSolver => countDistinct(col("label")) === 1
          case _ => lit(true)
        }).as("solved"))
      .filter(col("solved") && col("lbl").isNotNull &&
        col("lbl") =!= "NS")
      .select(col("evidence_id"), (col("lbl") === "YE").as("label"))
  }
}
