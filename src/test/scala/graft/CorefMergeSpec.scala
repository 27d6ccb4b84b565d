package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.canonical.CorefMerge
import graft.canonical.CorefMerge.{CorefError, Ent}
import graft.schema.Mention

/** Golden cases from
  * `/root/reference/tests/test_stanford_preprocess.py:323-406`. */
class CorefMergeSpec extends AnyFunSuite {

  private val tokens = ("Diego did it . He scored on the first half , " +
    "and now he did it again . Diego Maradona , the best player ever , " +
    "won the game alone .").split(" ")

  private val chain: CorefMerge.Chain = Seq(
    (0, 1, 0), (4, 5, 4), (13, 14, 13), (18, 20, 18), (21, 25, 23))

  private def mention(i: Int, j: Int, key: String, kind: String = "K",
      gazette: Boolean = false, anaphora: Boolean = false): Mention =
    Mention("d", i, j, kind, tokens.slice(i, j).mkString(" "), key,
      gazette, 0, anaphora)

  test("no existing EO in chain: nothing created") {
    val out = CorefMerge.applyChain("d", tokens, Nil,
      k => Ent(k, "K", None), chain)
    assert(out.isEmpty)
  }

  test("mixed kinds raise") {
    val ms = Seq(mention(0, 1, "e1", "K1"), mention(4, 5, "e2", "K2"))
    val ents = Map(
      "e1" -> Ent("e1", "K1", None), "e2" -> Ent("e2", "K2", None))
    assertThrows[CorefError] {
      CorefMerge.applyChain("d", tokens, ms, ents.apply, chain)
    }
  }

  test(">=2 distinct gazette items raise") {
    val ms = Seq(mention(0, 1, "e1", gazette = true),
      mention(4, 5, "e2", gazette = true))
    val ents = Map(
      "e1" -> Ent("e1", "K", Some("g1")), "e2" -> Ent("e2", "K", Some("g2")))
    assertThrows[CorefError] {
      CorefMerge.applyChain("d", tokens, ms, ents.apply, chain)
    }
  }

  test("one existing EO: all other mentions created as anaphora with its entity") {
    val ms = Seq(mention(0, 1, "e1"))
    val out = CorefMerge.applyChain("d", tokens, ms,
      k => Ent(k, "K", None), chain)
    assert(out.size == chain.size)
    assert(out.forall(_.entity_key == "e1"))
    assert(out.count(!_.anaphora) == 1)
  }

  test("anaphora-only representants: nothing created") {
    val ms = Seq(mention(0, 1, "e1", anaphora = true))
    val out = CorefMerge.applyChain("d", tokens, ms,
      k => Ent(k, "K", None), chain)
    assert(out.size == 1)
  }

  test("NER-born entity beats gazette-born as canonical") {
    val ms = Seq(mention(0, 1, "gz", gazette = true), mention(4, 5, "ner"))
    val ents = Map(
      "gz" -> Ent("gz", "K", Some("g1")), "ner" -> Ent("ner", "K", None))
    val out = CorefMerge.applyChain("d", tokens, ms, ents.apply, chain)
    assert(out.size == chain.size)
    assert(out.forall(_.entity_key == "ner"))
  }

  test("several NER-born: first (by chain order) wins") {
    val ms = Seq(mention(0, 1, "e1"), mention(4, 5, "e2"))
    val out = CorefMerge.applyChain("d", tokens, ms,
      k => Ent(k, "K", None), chain)
    assert(out.forall(_.entity_key == "e1"))
  }

  test("long phrases (>=5 tokens) shrink to head token") {
    val ms = Seq(mention(0, 1, "e1"))
    // chain incl. (21,25,23) 'the best player ever' is only 4 tokens; use
    // a longer synthetic span to hit the shrink rule
    val longChain: CorefMerge.Chain = Seq((0, 1, 0), (7, 12, 9))
    val out = CorefMerge.applyChain("d", tokens, ms,
      k => Ent(k, "K", None), longChain)
    val created = out.filter(_.anaphora)
    assert(created.map(m => (m.offset, m.offset_end)) == Seq((9, 10)))
  }
}
