package graft.labels

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Q7 — the next-segment-to-label priority cascade, ported from
  * `/root/reference/iepy/data/models.py:568-608`
  * (`Relation.get_next_segment_to_label`).
  *
  * The reference walks five querysets in priority order and returns the
  * first hit's segment:
  *
  *   1. own_none_labels    — THIS judge's unanswered questions
  *                           (human label rows with label NULL, judge = me)
  *   2. never_considered_ev — candidate evidences no human was ever asked
  *                           about (no human label row at all)
  *   3. never_considered_segm — segments none of whose evidences carry ANY
  *                           label for the relation (`models.py:573`
  *                           excludes via labels of any judge/machine)
  *   4. to_re_answer       — evidences with no GOOD answer at all: no
  *                           label in NOT_NEED_RELABEL = {YE, NO, NS}
  *                           from anyone (`models.py:589-591` — the
  *                           reference checks all labels here, machine
  *                           included, per its own comment "not just for
  *                           this judge")
  *   5. none_labels        — ANY judge's unanswered questions
  *
  * Batch recast: instead of five sequential first-row probes, build the
  * whole prioritized work queue — per segment the best (min) priority of
  * any branch it appears in — and let the caller consume it in
  * (priority, segment_id) order. [[next]] reproduces the reference's
  * single-pick semantics exactly: min over (priority, segment_id),
  * because each reference queryset is ordered by segment id
  * (`models.py:572,578,584`).
  *
  * Inputs:
  *  - segments:  [segment_id]                      (kind-filtered, Q1)
  *  - evidences: [evidence_id, segment_id]         (candidates, Q2/Q3)
  *  - labels:    [evidence_id, label (nullable: YE/NO/SK/NS), judge,
  *                by_machine]                      (for this relation)
  *
  * Plan shape: five branches = two broadcast-ready joins + three
  * left-anti joins on key columns, one union, one min-aggregation —
  * every aggregate algebraic, no window, no collect. At 100 TB the
  * labels side is human-annotation-bounded (always broadcastable); the
  * segment/evidence sides shuffle once on their own keys.
  */
object NextSegment {

  val NotNeedRelabel: Seq[String] = Seq("YE", "NO", "NS")

  def queue(
      segments: DataFrame,
      evidences: DataFrame,
      labels: DataFrame,
      judge: String): DataFrame = {
    val human = labels.filter(!col("by_machine"))

    val b1 = human
      .filter(col("label").isNull && col("judge") === judge)
      .join(evidences, "evidence_id")
      .select(col("segment_id"), lit(1).as("priority"))

    val b2 = evidences
      .join(human.select(col("evidence_id")), Seq("evidence_id"),
        "left_anti")
      .select(col("segment_id"), lit(2).as("priority"))

    val considered = evidences
      .join(labels.select(col("evidence_id")), Seq("evidence_id"),
        "left_semi")
      .select(col("segment_id"))
    val b3 = segments
      .join(considered, Seq("segment_id"), "left_anti")
      .select(col("segment_id"), lit(3).as("priority"))

    val good = labels
      .filter(col("label").isin(NotNeedRelabel: _*))
      .select(col("evidence_id"))
    val b4 = evidences
      .join(good, Seq("evidence_id"), "left_anti")
      .select(col("segment_id"), lit(4).as("priority"))

    val b5 = human
      .filter(col("label").isNull)
      .join(evidences, "evidence_id")
      .select(col("segment_id"), lit(5).as("priority"))

    b1.unionByName(b2).unionByName(b3).unionByName(b4).unionByName(b5)
      .groupBy(col("segment_id"))
      .agg(min(col("priority")).as("priority"))
  }

  /** The reference's single pick: first segment of the first non-empty
    * branch (None when every branch is empty, `models.py:608`). */
  def next(
      segments: DataFrame,
      evidences: DataFrame,
      labels: DataFrame,
      judge: String): Option[Row] =
    queue(segments, evidences, labels, judge)
      .orderBy(col("priority").asc, col("segment_id").asc)
      .limit(1).collect().headOption
}
