package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.canonical.{CorefChains, CorefMerge}
import graft.schema.Mention

/** P10 chain producer + end-to-end producer->applyChains behavior. */
class CorefChainsSpec extends AnyFunSuite {

  private def m(off: Int, end: Int, kind: String, alias: String,
      key: String, gaz: Boolean = false) =
    Mention("d", off, end, kind, alias, key, gaz, 1, anaphora = false)

  private def entOf(ms: Seq[Mention]): Map[String, CorefMerge.Ent] =
    ms.map(x => x.entity_key -> CorefMerge.Ent(x.entity_key, x.kind,
      if (x.from_gazette) Some(x.alias) else None)).toMap

  test("surface-identity chain groups folded aliases of one kind") {
    val toks = "ParseHeader1 calls stuff and Parse_Header1 again".split(" ")
    val ms = Seq(
      m(0, 1, "FUNCTION", "ParseHeader1", "d F 0 1"),
      m(4, 5, "FUNCTION", "Parse_Header1", "d F 4 5"))
    val ch = CorefChains.chains(toks, ms, pronouns = Set.empty)
    assert(ch == Seq(Seq((0, 1, 0), (4, 5, 4))))
  }

  test("gazette-born mentions never seed surface chains") {
    val toks = "parse_header calls ParseHeader".split(" ")
    val ms = Seq(
      m(0, 1, "FUNCTION", "parse_header", "parse_header", gaz = true),
      m(2, 3, "FUNCTION", "ParseHeader", "d F 2 3"))
    assert(CorefChains.chains(toks, ms, pronouns = Set.empty).isEmpty)
  }

  test("pronoun resolves to nearest preceding mention") {
    val toks = "parse_header runs daily and it logs output".split(" ")
    val ms = Seq(
      m(0, 1, "FUNCTION", "parse_header", "parse_header", gaz = true))
    val ch = CorefChains.chains(toks, ms)
    assert(ch == Seq(Seq((0, 1, 0), (4, 5, 4))))
  }

  test("pronoun beyond maxDistance stays unresolved") {
    val toks = ("f0" +: Array.fill(40)("x") :+ "it").toArray
    val ms = Seq(m(0, 1, "FUNCTION", "f0", "f0", gaz = true))
    assert(CorefChains.chains(toks, ms, maxDistance = 30).isEmpty)
  }

  test("producer -> applyChains: pronoun becomes anaphora occurrence of the antecedent") {
    val toks = "parse_header runs daily and it logs output".split(" ")
    val ms = Seq(
      m(0, 1, "FUNCTION", "parse_header", "parse_header", gaz = true))
    val out = CorefMerge.applyChains("d", toks, ms, entOf(ms),
      CorefChains.chains(toks, ms))
    val created = out.find(_.offset == 4).get
    assert(created.anaphora && created.entity_key == "parse_header" &&
      created.kind == "FUNCTION" && created.from_gazette)
  }

  test("producer -> applyChains: NER dupes merge to first occurrence; refusals swallowed") {
    val toks = "EmitEvent starts then Emit_Event ends M1 M1".split(" ")
    val ms = Seq(
      m(0, 1, "FUNCTION", "EmitEvent", "d F 0 1"),
      m(3, 4, "FUNCTION", "Emit_Event", "d F 3 4"),
      // same folded alias but different kind in one chain position —
      // exercises the swallow path via a same-kind + cross-kind mix
      m(5, 6, "MODULE", "M1", "d M 5 6"),
      m(6, 7, "FUNCTION", "M1", "d F 6 7"))
    val out = CorefMerge.applyChains("d", toks, ms, entOf(ms),
      CorefChains.chains(toks, ms, pronouns = Set.empty))
    assert(out.count(_.entity_key == "d F 0 1") == 2) // merged pair
    // cross-kind pair untouched (kind partitioning keeps them apart)
    assert(out.exists(_.entity_key == "d M 5 6") &&
      out.exists(_.entity_key == "d F 6 7"))
  }
}
