package graft

import graft.rules.{CodeRules, RuleVerifier, Rules}
import graft.schema.Relation

/** R9 rules verifier (reference `rules_verifier.py:40-133`). */
class RuleVerifierSpec extends SparkSpec {

  test("per-rule metrics vs human labels") {
    import spark.implicits._
    val rel = Relation("born in", "PERSON", "DATE")
    val pos = MarkupDsl.evidence(
      "{John|person**} was born in {1950|date*} .")
    val neg = MarkupDsl.evidence(
      "{Mary|person**} died in {1990|date*} .")
    val labeled = Seq((pos, true), (neg, false)).toDS()
    val anything = Rules.Star(Rules.AnyTok)
    val good = Rules.Rule("was_born", true, 0, (s, o) =>
      anything + s + Rules.Token("was born in") + o + anything)
    val out = RuleVerifier.verify(spark, labeled, Seq(good), rel)
      .collect().map(r => r.getAs[String]("rule") ->
        (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
          r.getAs[Long]("tn"), r.getAs[Long]("fn"))).toMap
    // matches pos (predicts true), doesn't match neg (predicts false)
    assert(out("was_born") == ((1L, 0L, 1L, 0L)))
  }

  test("corpus rule set scores perfectly on its own templates") {
    import spark.implicits._
    val posEv = MarkupDsl.evidence(
      "Function {parse_header_1|function**} calls function {emit_event_2|function*} .")
    val negEv = MarkupDsl.evidence(
      "Function {parse_header_1|function**} never calls function {emit_event_2|function*} .")
    val labeled = Seq((posEv, true), (negEv, false)).toDS()
    val out = RuleVerifier.verify(spark, labeled,
      CodeRules.callsRules.filter(_.name == "calls_explicit"),
      CodeRules.CallsRelation)
      .collect().head
    assert(out.getAs[Double]("f1") == 1.0)
  }
}
