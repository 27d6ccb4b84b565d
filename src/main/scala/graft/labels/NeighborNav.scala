package graft.labels

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Q8 — labeled-neighbor navigation, ported from
  * `Relation.labeled_neighbor` (`/root/reference/iepy/data/models.py:511-566`).
  *
  * The reference walks the id-ordered set of segments that carry labeled
  * evidence for the relation (labels with judge AND label non-null —
  * note it does NOT filter labeled_by_machine here, so machine labels
  * count; optionally restricted to one judge) and returns the
  * previous/next id with these edge conventions:
  *   - first item's prev = its own id; last item's next = its own id;
  *   - an id NOT in the labeled set navigates to the LAST labeled id;
  *   - empty labeled set -> None.
  *
  * [[nav]] is the batch recast: the full navigation table (one row per
  * labeled segment with prev_id/next_id), an unpartitioned window over
  * the labeled set — safe because labeled data is human-annotation-
  * bounded, never corpus-sized (same argument as the C7 pooling).
  * [[neighbor]] reproduces the reference's single-object call exactly.
  */
object NeighborNav {

  /** Distinct ids of segments (from the kind-filtered `segments` set)
    * with at least one labeled evidence. */
  def labeledSegments(
      segments: DataFrame,
      evidences: DataFrame,
      labels: DataFrame,
      judge: Option[String] = None): DataFrame = {
    val base = labels
      .filter(col("judge").isNotNull && col("label").isNotNull)
    val judged = judge.fold(base)(j => base.filter(col("judge") === j))
    evidences
      .join(judged.select(col("evidence_id")), Seq("evidence_id"),
        "left_semi")
      .select(col("segment_id")).distinct()
      .join(segments, Seq("segment_id"), "left_semi")
  }

  /** Navigation table: [segment_id, prev_id, next_id] over the labeled
    * set, id-ordered, with the reference's own-id edge conventions. */
  def nav(
      segments: DataFrame,
      evidences: DataFrame,
      labels: DataFrame,
      judge: Option[String] = None): DataFrame = {
    val w = Window.orderBy(col("segment_id"))
    labeledSegments(segments, evidences, labels, judge)
      .select(col("segment_id"),
        coalesce(lag(col("segment_id"), 1).over(w), col("segment_id"))
          .as("prev_id"),
        coalesce(lead(col("segment_id"), 1).over(w), col("segment_id"))
          .as("next_id"))
  }

  /** The reference's single pick (`models.py:546-566`): prev/next of
    * `objId` in the labeled set; not-in-list -> last labeled id;
    * empty -> None. */
  def neighbor(
      segments: DataFrame,
      evidences: DataFrame,
      labels: DataFrame,
      objId: Long,
      back: Boolean,
      judge: Option[String] = None): Option[Long] = {
    val ids = labeledSegments(segments, evidences, labels, judge)
      .orderBy(col("segment_id"))
      .collect().map(_.getLong(0))
    if (ids.isEmpty) return None
    val idx = ids.indexOf(objId)
    if (idx < 0) Some(ids.last)
    else if (back) Some(if (idx == 0) objId else ids(idx - 1))
    else Some(if (idx == ids.length - 1) objId else ids(idx + 1))
  }
}
