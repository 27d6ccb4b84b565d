package graft

import graft.labels.NextSegment

/** Q7 cascade semantics vs `models.py:568-608`: branch priorities,
  * per-branch membership, and the single-pick tie-break. */
class NextSegmentSpec extends SparkSpec {
  import spark.implicits._

  // segments 1..6; evidences ev<N> on segment N
  private def segs = Seq(1L, 2L, 3L, 4L, 5L, 6L).toDF("segment_id")
  private def evs = Seq(
    ("ev1", 1L), ("ev2", 2L), ("ev4", 4L), ("ev5", 5L), ("ev6", 6L)
  ).toDF("evidence_id", "segment_id")
  // labels: (evidence, label, judge, by_machine). Note an evidence whose
  // ONLY labels are NULL/SK sits in to_re_answer (b4) — the reference's
  // exclude(labels__label__in=[YE,NO,NS]) keeps it — so isolating b5
  // needs a good answer from a third judge alongside the empty one.
  private def labels = Seq(
    ("ev1", null, "me", false),      // my unanswered question -> b1
    ("ev1", "YE", "third", false),   //   (answered well by third judge)
    ("ev2", null, "other", false),   // someone else's unanswered -> b5
    ("ev2", "YE", "third", false),   //   (good answer blocks b4)
    ("ev4", "SK", "other", false),   // only SKIP answers -> b4
    ("ev5", "YE", "other", false),   // good answer -> no branch
    ("ev6", "YE", "robot", true)     // machine-only label: human never
                                     // asked -> b2 (but segment IS
                                     // considered, so not b3)
  ).toDF("evidence_id", "label", "judge", "by_machine")

  test("queue assigns each segment its best branch priority") {
    val q = NextSegment.queue(segs, evs, labels, "me")
      .as[(Long, Int)].collect().toMap
    assert(q(1L) == 1) // own empty answer
    assert(q(6L) == 2) // evidence never shown to a human
    assert(q(3L) == 3) // segment with no evidence at all: never considered
    assert(q(4L) == 4) // needs re-answer (only SK)
    assert(q(2L) == 5) // anyone's empty answer
    assert(!q.contains(5L)) // fully answered: not in the queue
  }

  test("b1 vs b5: own unanswered beats other judges' unanswered") {
    val q = NextSegment.queue(segs, evs, labels, "other")
      .as[(Long, Int)].collect().toMap
    assert(q(2L) == 1 && q(1L) == 5)
  }

  test("next = first non-empty branch, segment-id ordered (models.py:594-608)") {
    val n = NextSegment.next(segs, evs, labels, "me").get
    assert(n.getLong(0) == 1L && n.getInt(1) == 1)
    // drop ev1's labels: it becomes never-human-labeled -> b2 wins
    val noB1 = labels.where($"evidence_id" =!= "ev1")
    val evNoB2 = evs.where($"evidence_id" =!= "ev6")
    val n2 = NextSegment.next(segs, evNoB2, noB1, "me").get
    assert(n2.getInt(1) == 2 && n2.getLong(0) == 1L)
    // drop ev1 entirely too: segments 1/3/6 have no considered evidence
    // -> never-considered-segment branch, first by id
    val evMin = evs.where(!$"evidence_id".isin("ev1", "ev6"))
    val n3 = NextSegment.next(segs, evMin, noB1, "me").get
    assert(n3.getInt(1) == 3 && n3.getLong(0) == 1L)
  }

  test("empty everything -> every segment is never-considered; no labels no crash") {
    val empty = labels.limit(0)
    val q = NextSegment.queue(segs, evs.limit(0), empty, "me")
      .as[(Long, Int)].collect().toMap
    assert(q.size == 6 && q.values.forall(_ == 3))
  }
}
