package graft

import graft.features.FeatureConfig
import graft.rules.Rules
import graft.schema.Relation
import graft.sources.Sources

/** F20/F21 + S3 normalizer fixtures. */
class FeatureConfigSpec extends SparkSpec {

  test("F21: config names resolve in order; unknown name raises") {
    import spark.implicits._
    val df = Seq(MarkupDsl.evidence(
      "Drinking {Mate|thing*} makes you go to the {toilet|thing**}")).toDF()
    val out = FeatureConfig.applyConfig(df,
      Seq("bag_of_words", "entity_distance", "verbs_count"))
    assert(out.columns.contains("f_bag_of_words"))
    assert(out.select("f_entity_distance").head.getInt(0) == 5)
    assertThrows[IllegalArgumentException] {
      FeatureConfig.applyConfig(df, Seq("no_such_feature"))
    }
  }

  test("F20: rule match as 0/1 feature column (features.py:43-49)") {
    import spark.implicits._
    val pos = MarkupDsl.evidence("{John|person**} was born in {1950|date*} x")
    val neg = MarkupDsl.evidence("{Mary|person**} knows nothing of {1990|date*} x")
    val rule = Rules.Rule("was_born", true, 0, (s, o) =>
      Rules.Star(Rules.AnyTok) + s + Rules.Token("was born in") + o +
        Rules.Star(Rules.AnyTok))
    val out = FeatureConfig.ruleAsFeature(spark, Seq(pos, neg).toDS(),
      rule, Relation("r", "PERSON", "DATE"))
      .collect().map(r => r.getString(0) -> r.getInt(1)).toMap
    assert(out(pos.evidence_id) == 1)
    assert(out(neg.evidence_id) == 0)
  }

  test("S3: lowercase-unless-acronym normalizer (literal.py:109-119)") {
    assert(Sources.toLowerNormalizer("The NASA Space Program") ==
      "the NASA space program")
    assert(Sources.toLowerNormalizer("IBM") == "IBM")
    assert(Sources.toLowerNormalizer("Plain Words") == "plain words")
  }
}
