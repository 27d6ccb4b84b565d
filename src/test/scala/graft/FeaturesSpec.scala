package graft

import org.apache.spark.sql.Row
import graft.features.Features
import graft.schema.Evidence

/** Golden feature values from `/root/reference/tests/test_features.py`
  * (markup fixtures with the DT/JJ/NN POS cycle). */
class FeaturesSpec extends SparkSpec {

  private def featRow(markup: String): Row = {
    import spark.implicits._
    val ev: Evidence = MarkupDsl.evidence(markup)
    Features.withDefaultFeatures(Seq(ev).toDS().toDF()).collect().head
  }

  private def strSet(r: Row, col: String): Set[String] =
    r.getAs[scala.collection.Seq[String]](col).toSet

  private val mate =
    "Drinking {Mate|thing*} makes you go to the {toilet|thing**}"

  test("bag_of_words (test_features.py:61-70)") {
    assert(strSet(featRow(mate), "f_bag_of_words") ==
      "drinking mate makes you go to the toilet".split(" ").toSet)
    assert(strSet(featRow("Drinking"), "f_bag_of_words") == Set("drinking"))
    assert(strSet(featRow(""), "f_bag_of_words") == Set())
  }

  test("bag_of_pos (:73-82)") {
    assert(strSet(featRow(mate), "f_bag_of_pos") == Set("DT", "JJ", "NN"))
    assert(strSet(featRow("Drinking"), "f_bag_of_pos") == Set("DT"))
  }

  test("bag_of_words_in_between both EO orders (:136-147)") {
    val expected = Set("makes", "you", "go", "to", "the")
    assert(strSet(featRow(mate), "f_bag_of_words_in_between") == expected)
    val flipped =
      "Drinking {Mate|thing**} makes you go to the {toilet|thing*}"
    assert(strSet(featRow(flipped), "f_bag_of_words_in_between") == expected)
  }

  test("bag_of_pos_in_between (:150-160)") {
    assert(strSet(featRow(mate), "f_bag_of_pos_in_between") ==
      Set("DT", "JJ", "NN"))
  }

  test("entity_order (:210-217)") {
    // A = right EO; 1 iff A before B
    assert(featRow(mate).getAs[Int]("f_entity_order") == 1)
    val flipped =
      "Drinking {Mate|thing**} makes you go to the {toilet|thing*}"
    assert(featRow(flipped).getAs[Int]("f_entity_order") == 0)
  }

  test("entity_distance (:220-231)") {
    assert(featRow(mate).getAs[Int]("f_entity_distance") == 5)
    assert(featRow("{Mate|thing*} {toilet|thing**}")
      .getAs[Int]("f_entity_distance") == 0)
  }

  test("other_entities_in_between (:234-249)") {
    val r = featRow(
      "Drinking {Mate|thing*} makes {you|told} go to the {toilet|thing**}")
    assert(r.getAs[Int]("f_other_entities_in_between") == 1)
    val many = featRow("Drinking {Mate|thing**} {makes|yeah} {you|told} " +
      "{go|bad} {to|music} {the|aaa} {toilet|thing*}")
    assert(many.getAs[Int]("f_other_entities_in_between") == 5)
    val multiword =
      featRow("Drinking {Argentinean Mate|thing*} {the|told} {toilet|thing**}")
    assert(multiword.getAs[Int]("f_other_entities_in_between") == 1)
    val zero = featRow("Drinking {Argentinean Mate|thing*} {toilet|thing**}")
    assert(zero.getAs[Int]("f_other_entities_in_between") == 0)
  }

  test("total_number_of_entities (:252-267)") {
    val r = featRow(
      "Drinking {Mate|thing*} makes {you|told} go to the {toilet|thing**}")
    assert(r.getAs[Int]("f_total_number_of_entities") == 3)
    assert(featRow(mate).getAs[Int]("f_total_number_of_entities") == 2)
    val many = featRow("Drinking {Mate|thing**} {makes|yeah} {you|told} " +
      "{go|bad} {to|music} {the|aaa} {toilet|thing*}")
    assert(many.getAs[Int]("f_total_number_of_entities") == 7)
  }

  test("verbs_count with all-JJ cycle is 0 (:270-301)") {
    val r = featRow(mate)
    assert(r.getAs[Int]("f_verbs_count_in_between") == 0)
    assert(r.getAs[Int]("f_verbs_count") == 0)
  }

  test("verbs counted with VB tags (:270-301)") {
    import spark.implicits._
    val ev = MarkupDsl.evidence(
      "Drinking {Mate|thing**} makes you go to the {toilet|thing*}",
      basePos = Seq("VB", "VBD"))
    val r = Features.withDefaultFeatures(Seq(ev).toDS().toDF())
      .collect().head
    assert(r.getAs[Int]("f_verbs_count_in_between") == 5)
    val ev2 = MarkupDsl.evidence(
      "Drinking {Argentinean Mate|thing**} makes you go to the {toilet|thing*}",
      basePos = Seq("VB", "VBD"))
    val r2 = Features.withDefaultFeatures(Seq(ev2).toDS().toDF())
      .collect().head
    assert(r2.getAs[Int]("f_verbs_count") == 9)
  }

  test("symbols_in_between boolean (:304-313)") {
    val one =
      "Drinking {Mate|thing**}, makes you go to the {toilet|thing*}"
    assert(featRow(one).getAs[Int]("f_symbols_in_between") == 1)
    val two =
      "Drinking {Mate|thing**}, makes you go, to the {toilet|thing*}"
    assert(featRow(two).getAs[Int]("f_symbols_in_between") == 1)
    assert(featRow(mate).getAs[Int]("f_symbols_in_between") == 0)
  }

  test("number_of_tokens") {
    assert(featRow(mate).getAs[Int]("f_number_of_tokens") == 8)
  }

  test("in_between collapses when EOs touch/overlap/nest (features.py:259-267)") {
    val touching = featRow("{Mate|thing*} {toilet|thing**} end")
    assert(touching.getAs[Int]("f_entity_distance") == 0)
  }
}
