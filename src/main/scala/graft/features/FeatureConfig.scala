package graft.features

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions.col
import graft.candidates.Candidates
import graft.rules.Rules
import graft.schema.{Evidence, Relation}

/** F20/F21: the data-driven feature configuration of the reference
  * (`/root/reference/iepy/extraction/features.py:52-87`, defaults in
  * `iepy/defaults.py:6-25`): feature NAMES (strings, possibly with
  * arguments) resolve at runtime to functions. Our registry maps a name
  * to a DataFrame transform adding the column `f_<name>`.
  *
  * F20 `rule-as-feature` (`features.py:43-49`): a compiled token-regex
  * rule applied to each evidence yields a 0/1 feature column — the rule
  * engine invoked inside feature extraction.
  */
object FeatureConfig {

  type FeatureFn = DataFrame => DataFrame

  /** Built-in registry: name -> transform (mirrors the default active
    * set of `iepy/defaults.py:6-25`). */
  val registry: Map[String, FeatureFn] = {
    import Features._
    def add(name: String)(c: DataFrame => org.apache.spark.sql.Column): (String, FeatureFn) =
      name -> ((df: DataFrame) => {
        val withIb =
          if (df.columns.contains("ib")) df
          else df.withColumn("ib", inBetweenCol)
        withIb.withColumn(s"f_$name", c(withIb))
      })
    Map(
      add("bag_of_words")(_ => bagOfWords(col("tokens"))),
      add("bag_of_pos")(_ => bagOfPos(col("postags"))),
      add("bag_of_word_bigrams")(_ => bagOfWordBigrams(col("tokens"))),
      add("bag_of_wordpos")(_ => bagOfWordpos(col("tokens"), col("postags"))),
      add("bag_of_wordpos_bigrams")(_ =>
        bagOfWordposBigrams(col("tokens"), col("postags"))),
      add("bag_of_words_in_between")(_ =>
        bagOfWordsInBetween(col("tokens"), col("ib"))),
      add("bag_of_pos_in_between")(_ =>
        bagOfPosInBetween(col("postags"), col("ib"))),
      add("bag_of_word_bigrams_in_between")(_ =>
        bagOfWordBigramsInBetween(col("tokens"), col("ib"))),
      add("bag_of_wordpos_in_between")(_ =>
        bagOfWordposInBetween(col("tokens"), col("postags"), col("ib"))),
      add("bag_of_wordpos_bigrams_in_between")(_ =>
        bagOfWordposBigramsInBetween(col("tokens"), col("postags"), col("ib"))),
      add("entity_order")(_ =>
        entityOrder(col("left_offset"), col("right_offset"))),
      add("entity_distance")(_ => entityDistance(col("ib"))),
      add("other_entities_in_between")(_ =>
        otherEntitiesInBetween(col("mentions"), col("ib"))),
      add("total_number_of_entities")(_ =>
        totalNumberOfEntities(col("mentions"))),
      add("verbs_count_in_between")(_ =>
        verbsCountInBetween(col("postags"), col("ib"))),
      add("verbs_count")(_ => verbsCount(col("postags"))),
      add("in_same_sentence")(_ => inSameSentence(col("ib"))),
      add("symbols_in_between")(_ =>
        symbolsInBetween(col("tokens"), col("ib"))),
      add("number_of_tokens")(_ => numberOfTokens(col("tokens"))),
      // F22 (lex_features.py:38-71): available-but-not-default, like the
      // reference, whose default config never lists them (the module is
      // incomplete upstream and its trees are never populated)
      add("chunk_tag")(_ => bagOfChunkTags(col("postags"))),
      add("iob_chain")(_ => bagOfIobChains(col("postags"))))
  }

  /** Resolve a config (list of feature names) and apply in order;
    * unknown names raise, like the reference's import failure. */
  def applyConfig(df: DataFrame, names: Seq[String]): DataFrame =
    names.foldLeft(df) { (acc, name) =>
      registry.getOrElse(name,
        throw new IllegalArgumentException(s"Unknown feature: $name"))(acc)
    }

  /** F20: rule match as a feature column over a typed evidence Dataset.
    * The NFA is compiled once per partition and evaluated in-row
    * (reference `features.py:43-49,73-75`). */
  def ruleAsFeature(
      spark: SparkSession,
      evidence: Dataset[Evidence],
      rule: Rules.Rule,
      relation: Relation): DataFrame = {
    import spark.implicits._
    evidence.mapPartitions { it =>
      val m = new Rules.Matcher(Rules.prefixed(rule.build(
        Rules.subjectPat(relation.leftKind),
        Rules.objectPat(relation.rightKind))))
      it.map(ev =>
        (ev.evidence_id,
          if (m.matches(Candidates.tokensToMatch(ev))) 1 else 0))
    }.toDF("evidence_id", s"f_rule_${rule.name}")
  }
}
