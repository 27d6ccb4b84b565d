package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.preprocess.{LiteralNer, NerRunner, TagRunNer}
import graft.schema.Mention

/** Golden cases from `/root/reference/tests/test_literal_ner.py` and the
  * combiner policies of `/root/reference/iepy/preprocess/ner/combiner.py`. */
class NerSpec extends AnyFunSuite {

  // fixture gazette (tests/test_literal_ner.py:17-24): file order matters,
  // overlapping literal 'drooling' takes the LAST file's label
  private val gazette = Seq(
    ("HIV", "DISEASE"), ("Hepatitis C", "DISEASE"),
    ("brain tumor", "DISEASE"), ("drooling", "DISEASE"),
    ("MRI", "MEDICAL_TEST"), ("CT scan", "MEDICAL_TEST"),
    ("drooling", "MEDICAL_TEST"))
  private val ner = new LiteralNer(gazette)

  test("literal longest-match spans and labels") {
    val sent = "CT scan said HIV MRI Hepatitis C".split(" ").toIndexedSeq
    assert(ner.entities(sent) == Seq(
      ((0, 2), "MEDICAL_TEST"), ((3, 4), "DISEASE"),
      ((4, 5), "MEDICAL_TEST"), ((5, 7), "DISEASE")))
  }

  test("overlapping vocabulary: last label wins") {
    val sent = "patient was drooling".split(" ").toIndexedSeq
    assert(ner.entities(sent) == Seq(((2, 3), "MEDICAL_TEST")))
  }

  test("failed long match does not match shorter prefix name") {
    // 'Hepatitis' alone is a prefix but not a name
    val sent = "Hepatitis B is worse".split(" ").toIndexedSeq
    assert(ner.entities(sent).isEmpty)
  }

  test("runner produces global offsets across sentences") {
    val tokens = "CT scan done . Then MRI".split(" ")
    val sentences = Array(0, 4, 6)
    val ms = NerRunner.run(ner, 0, "d1", tokens, sentences)
    assert(ms.map(m => (m.offset, m.offset_end, m.kind)) ==
      Seq((0, 2, "MEDICAL_TEST"), (5, 6, "MEDICAL_TEST")))
    assert(ms.head.entity_key == "CT scan") // gazette identity by surface
    assert(ms.head.from_gazette)
  }

  test("tag-run NER groups contiguous same-kind runs") {
    val tag = new TagRunNer(t => if (t.head.isUpper) "NAME" else "O")
    assert(tag.entities("the Guido Van Rossum fan".split(" ").toIndexedSeq)
      == Seq(((1, 4), "NAME")))
  }

  private def m(doc: String, off: Int, end: Int, kind: String,
      rank: Int): Mention =
    Mention(doc, off, end, kind, "a", s"$doc $kind $off $end",
      from_gazette = false, ner_rank = rank, anaphora = false)

  test("no-overlap combiner: first NER wins") {
    val first = Seq(m("d", 0, 2, "A", 0))
    val second = Seq(m("d", 1, 3, "B", 1), m("d", 5, 6, "B", 1))
    val out = NerRunner.combineNoOverlap(Seq(first, second))
    assert(out.map(x => (x.offset, x.offset_end, x.kind)) ==
      Seq((0, 2, "A"), (5, 6, "B")))
  }

  test("kind-preference combiner keeps best (rank, -length)") {
    val a = Seq(m("d", 0, 2, "PERSON", 0))
    val b = Seq(m("d", 1, 4, "LOCATION", 1))
    // LOCATION ranked above PERSON -> b wins the overlap
    val out = NerRunner.combineKindPreference(Seq(a, b),
      Seq("LOCATION", "PERSON"))
    assert(out.map(x => x.kind) == Seq("LOCATION"))
    // unranked kinds are worst: PERSON ranked -> a wins
    val out2 = NerRunner.combineKindPreference(Seq(a, b), Seq("PERSON"))
    assert(out2.map(x => x.kind) == Seq("PERSON"))
  }

  test("kind-preference: longer occurrence kept on equal rank") {
    // reference criteria are (rank, -length), lower wins
    // (combiner.py:110-123) — the docstring says shorter, the code keeps
    // the longer; we follow the code
    val a = Seq(m("d", 0, 3, "X", 0))
    val b = Seq(m("d", 1, 2, "X", 1))
    val out = NerRunner.combineKindPreference(Seq(a, b), Seq("X"))
    assert(out.map(x => (x.offset, x.offset_end)) == Seq((0, 3)))
  }

  test("dedupe: gazette beats NER-born at same span") {
    val gaz = m("d", 0, 2, "A", 1).copy(from_gazette = true)
    val nerM = m("d", 0, 2, "A", 0)
    assert(NerRunner.dedupe(Seq(nerM, gaz)) == Seq(gaz))
  }
}
