package graft.rules

import graft.rules.Rules._
import graft.schema.Relation

/** The reference's canonical rule set, ported rule-for-rule from
  * `/root/reference/examples/birthdate/was_born_rules_sample.py:10-122`:
  * 10 positive rules + 1 higher-priority negative rule for the
  * (PERSON, DATE) "was born" relation. Combinator structure preserved.
  */
object BirthdateRules {

  val WasBornRelation: Relation = Relation("was born", "PERSON", "DATE")

  private val anything = Star(AnyTok)
  private def entityLeftover = Star(Pos("NNP"))
  private def place = Plus(Pos("NNP") + Question(Token(",")))

  val rules: Seq[Rule] = Seq(
    // Ex: Gary Sykes (Born 13 February 1984) is a British boxer.
    Rule("born_date_in_parenthesis", answer = true, priority = 0, (s, o) => {
      val born = Star(Pos(":")) +
        Question(Token("Born") | Token("born")) + Question(Token("c."))
      s + entityLeftover + Pos("-LRB-") + born + o + Pos("-RRB-") + anything
    }),
    // Ex: James Cunningham (born 1973 or 1974) is a Canadian comedian.
    Rule("born_two_dates_in_parenthesis", answer = true, priority = 0, (s, o) => {
      val born = Question(Token("Born") | Token("born"))
      val orObject = (o + Token("or") + Pos("CD")) |
        (Pos("CD") + Token("or") + o)
      s + entityLeftover + Pos("-LRB-") + born + orObject + Pos("-RRB-") + anything
    }),
    // Ex: Carl Bridgewater (January 2, 1965 - September 19, 1978) ...
    Rule("born_date_and_death_in_parenthesis", answer = true, priority = 0,
      (s, o) => s + Pos("-LRB-") + o + Token("-") + anything +
        Pos("-RRB-") + anything),
    // Ex: Gary Sykes (Born 13 February 1984, Leeds) ...
    Rule("born_date_and_place_in_parenthesis", answer = true, priority = 0,
      (s, o) => s + entityLeftover + Pos("-LRB-") +
        (Token("Born") | Token("born")) + o + Token(",") + place +
        Pos("-RRB-") + anything),
    // Ex: Shamsher M. Chowdhury was born in 1950.
    Rule("was_born_explicit_mention", answer = true, priority = 0,
      (s, o) => anything + s + Token("was born") + Pos("IN") + o + anything),
    // Ex: Xu is born in 1902 or 1903 ...
    Rule("is_born_in", answer = true, priority = 0,
      (s, o) => s + Token("is born in") + o + anything),
    // Ex: Harry Pilling, born Ashtonunder-Lyne, Lancashire on 2 Feb 1943
    Rule("mentions_real_name", answer = true, priority = 0,
      (s, o) => s + Token("born") + place + Pos("IN") + o + anything),
    // Ex: Nasser Sharify was born in Tehran, Iran, in 1925.
    Rule("was_born_and_mentions_place", answer = true, priority = 0,
      (s, o) => s + Token("was born") + Pos("IN") + place + Pos("IN") + o +
        Question(Pos("."))),
    // Ex: Theodone C. Hu was born in 1872 in Huangpu town, ...
    Rule("was_born_and_mentions_place_2", answer = true, priority = 0,
      (s, o) => s + Token("was born") + Pos("IN") + o + Pos("IN") + place +
        anything),
    // Ex: Lyle Eugene Hollister, born 6 July 1923 in Sioux Falls, ...
    Rule("just_born", answer = true, priority = 0,
      (s, o) => s + Token(", born") + o + anything),
    // NEGATIVE: Sophie Christiane of Wolfstein (...) — Wolfstein is a
    // place mislabeled as a person
    Rule("incorrect_labeling_of_place_as_person", answer = false,
      priority = 1,
      (s, o) => anything + place + Token("of") + s + anything))
}
