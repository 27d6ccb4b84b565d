package graft

import graft.labels.NeighborNav

/** Q8 navigation semantics vs `models.py:511-566`. */
class NeighborNavSpec extends SparkSpec {
  import spark.implicits._

  private def segs = Seq(1L, 2L, 3L, 4L, 5L).toDF("segment_id")
  private def evs = Seq(
    ("ev1", 1L), ("ev3", 3L), ("ev4", 4L), ("ev5", 5L)
  ).toDF("evidence_id", "segment_id")
  // labeled: segments 1, 3, 5 (ev4's label row has NULL label -> not
  // labeled; machine labels COUNT — the reference does not filter
  // by_machine here)
  private def labels = Seq(
    ("ev1", "YE", "me", false),
    ("ev3", "NO", "robot", true),
    ("ev4", null, "me", false),
    ("ev5", "SK", "other", false)
  ).toDF("evidence_id", "label", "judge", "by_machine")

  test("nav table: id order, own-id at the edges") {
    val nav = NeighborNav.nav(segs, evs, labels)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(nav.toSeq == Seq((1L, 1L, 3L), (3L, 1L, 5L), (5L, 3L, 5L)))
  }

  test("neighbor(): next/prev, edges return own id, unknown returns last") {
    def n(id: Long, back: Boolean) =
      NeighborNav.neighbor(segs, evs, labels, id, back)
    assert(n(3L, back = false).contains(5L))
    assert(n(3L, back = true).contains(1L))
    assert(n(5L, back = false).contains(5L)) // last: own id
    assert(n(1L, back = true).contains(1L))  // first: own id
    assert(n(2L, back = false).contains(5L)) // not in labeled set: last
  }

  test("judge filter restricts the labeled set; empty set -> None") {
    val nav = NeighborNav.nav(segs, evs, labels, judge = Some("me"))
      .as[(Long, Long, Long)].collect()
    assert(nav.toSeq == Seq((1L, 1L, 1L))) // only ev1 is labeled by me
    assert(NeighborNav.neighbor(segs, evs, labels, 1L, back = false,
      judge = Some("nobody")).isEmpty)
  }
}
