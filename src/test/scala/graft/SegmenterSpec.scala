package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.preprocess.Segmenter
import graft.candidates.Candidates
import graft.schema.{Doc, Mention, Relation}

/** Golden cases from `/root/reference/tests/test_segments.py:109-243`. */
class SegmenterSpec extends AnyFunSuite {

  private def doc100: Doc = {
    val tokens = Array.tabulate(100)(i => s"t$i")
    Doc("d", "r", "p", "c", "en", tokens.mkString(" "), "sha",
      tokens, Array.tabulate(100)(identity),
      tokens.map(_.toLowerCase), tokens.map(_ => "NN"),
      Array(0, 20, 50, 100))
  }

  private def m(off: Int, end: Int, kind: String = "K"): Mention =
    Mention("d", off, end, kind, s"a$off", s"e$off", false, 0, false)

  test("one segment per sentence with >=2 contained EOs (:214-231)") {
    val eos = Seq(1, 2, 22, 23, 35, 61, 80).map(i => m(i, i + 1))
    val segs = Segmenter.segmentsOf(doc100, eos)
    assert(segs.map(s => (s.offset, s.offset_end)) ==
      Seq((0, 20), (20, 50), (50, 100)))
    assert(segs.map(_.mentions.length) == Seq(2, 3, 2))
  }

  test("sentences with <2 EOs dropped (:233-242)") {
    val eos = Seq(m(1, 2), m(22, 23), m(23, 24))
    val segs = Segmenter.segmentsOf(doc100, eos)
    assert(segs.map(s => (s.offset, s.offset_end)) == Seq((20, 50)))
  }

  test("EOs straddling segment borders excluded (:109-119)") {
    val eos = Seq(m(18, 22), m(21, 23), m(24, 25))
    val segs = Segmenter.segmentsOf(doc100, eos)
    assert(segs.size == 1)
    assert(segs.head.mentions.map(_.eo_id).toSeq ==
      Seq("d:21:23", "d:24:25"))
  }

  test("hydration slices arrays and re-bases mentions (:33-44,121-132)") {
    val eos = Seq(m(22, 24), m(35, 36))
    val seg = Segmenter.segmentsOf(doc100, eos).head
    assert(seg.tokens.length == 30)
    assert(seg.tokens.head == "t20")
    assert(seg.mentions.map(x => (x.offset, x.offset_end)).toSeq ==
      Seq((2, 4), (15, 16)))
  }

  test("pair generation: |L|x|R| minus identical, order preserved (:144-178)") {
    val eos = Seq(m(21, 22, "A"), m(23, 24, "A"), m(25, 26, "B"))
    val seg = Segmenter.segmentsOf(doc100, eos).head
    val ab = Candidates.evidencesOf(seg, Relation("r", "A", "B"))
    assert(ab.map(e => (e.left_offset, e.right_offset)) ==
      Seq((1, 5), (3, 5)))
    val aa = Candidates.evidencesOf(seg, Relation("r", "A", "A"))
    // cross product minus the identical occurrence
    assert(aa.map(e => (e.left_offset, e.right_offset)) ==
      Seq((1, 3), (3, 1)))
  }

  test("same-kind relation needs >=2 occurrences (test_relations.py:105-117)") {
    val eos = Seq(m(21, 22, "A"), m(25, 26, "B"))
    val seg = Segmenter.segmentsOf(doc100, eos).head
    assert(Candidates.evidencesOf(seg, Relation("r", "A", "A")).isEmpty)
    assert(Candidates.evidencesOf(seg, Relation("r", "B", "B")).isEmpty)
    assert(Candidates.evidencesOf(seg, Relation("r", "A", "B")).size == 1)
  }

  test("deterministic evidence ids are re-run stable (Q3 idempotency)") {
    val eos = Seq(m(21, 22, "A"), m(25, 26, "B"))
    val seg1 = Segmenter.segmentsOf(doc100, eos).head
    val seg2 = Segmenter.segmentsOf(doc100, eos).head
    val e1 = Candidates.evidencesOf(seg1, Relation("r", "A", "B")).head
    val e2 = Candidates.evidencesOf(seg2, Relation("r", "A", "B")).head
    assert(e1.evidence_id == e2.evidence_id)
  }
}
