package graft.rules

import graft.rules.Rules._
import graft.schema.Relation

/** Rule sets for the source-code corpus relations, written in the same
  * combinator style as the reference's canonical rule module
  * (`/root/reference/examples/birthdate/was_born_rules_sample.py:10-122`):
  * positive rules, a higher-priority negative rule, trailing/leading
  * `Star(Any)` to (un)anchor.
  */
object CodeRules {

  val CallsRelation: Relation = Relation("calls", "FUNCTION", "FUNCTION")
  val DefinedInRelation: Relation = Relation("defined_in", "FUNCTION", "MODULE")

  private val anything = Star(AnyTok)

  val callsRules: Seq[Rule] = Seq(
    Rule("calls_explicit", answer = true, priority = 0,
      (s, o) => anything + s + Token("calls") + Token("function") + o + anything),
    Rule("invokes_explicit", answer = true, priority = 0,
      (s, o) => anything + s + Token("invokes") + Token("function") + o + anything),
    Rule("never_calls", answer = false, priority = 1,
      (s, o) => anything + s + Token("never") + Token("calls") +
        Token("function") + o + anything))

  val definedInRules: Seq[Rule] = Seq(
    Rule("defined_in_module", answer = true, priority = 0,
      (s, o) => anything + s + Token("is defined in") + Token("module") +
        o + anything))

  val relations: Seq[(Relation, Seq[Rule])] = Seq(
    CallsRelation -> callsRules,
    DefinedInRelation -> definedInRules)
}
