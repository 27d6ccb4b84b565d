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
    // One aggregation pass over labels computes every per-evidence
    // existence flag the five branches test — the branch-per-queryset
    // shape re-derived and re-joined the label table five times (and
    // the evidence table four), paying ~9 joins/exchanges for what is
    // per-evidence boolean algebra. Flags are algebraic max-of-bool
    // aggregates (map-side combinable), the five-way priority is a
    // single when-cascade ordered by priority (first hit == min, since
    // 1 < 2 < 4 < 5), and only branch 3 still needs the segments
    // anti-join. Branch semantics are unchanged (NextSegmentSpec +
    // the q11 oracle pin them):
    //   1: a human row with NULL label by THIS judge
    //   2: no human row at all
    //   4: no good (YE/NO/NS) label from anyone, machine included
    //   5: a human row with NULL label by any judge
    val human = !col("by_machine")
    val flags = labels.groupBy(col("evidence_id")).agg(
      max(human && col("label").isNull && col("judge") === judge)
        .as("own_null"),
      max(human).as("has_human"),
      max(col("label").isin(NotNeedRelabel: _*)).as("has_good"),
      max(human && col("label").isNull).as("human_null"))
    val ev = evidences.join(flags, Seq("evidence_id"), "left")
    val priority = when(col("own_null"), 1)
      .when(col("has_human").isNull || !col("has_human"), 2)
      .when(col("has_good").isNull || !col("has_good"), 4)
      .when(col("human_null"), 5)
    val evBranches = ev
      .select(col("segment_id"), priority.as("priority"))
      .where(col("priority").isNotNull)
    // branch 3: segments none of whose evidences carry ANY label row —
    // an evidence with any label row appears in `flags`, so the inner
    // join above IS the "considered" set
    val considered = evidences
      .join(flags.select(col("evidence_id")), Seq("evidence_id"),
        "left_semi")
      .select(col("segment_id"))
    val b3 = segments
      .join(considered, Seq("segment_id"), "left_anti")
      .select(col("segment_id"), lit(3).as("priority"))
    evBranches.unionByName(b3)
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
