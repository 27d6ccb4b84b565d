package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.ml.ActiveLoop

/** C9 checkpointed batch rounds. */
class ActiveLoopSpec extends SparkSpec {

  test("rounds grow the labels checkpoint; loop resumes from disk") {
    import spark.implicits._
    val people = Seq("John", "Mary", "Carl", "Anna", "Peter", "Rosa",
      "Tim", "Vera", "Hugo", "Lena", "Omar", "Ruth", "Ivan", "Nora")
    val evidences = people.zipWithIndex.flatMap { case (p, i) =>
      Seq(
        (MarkupDsl.evidence(s"{$p|person**} was born in {1${900 + i}|date*} ok"), true),
        (MarkupDsl.evidence(s"{$p|person**} met a friend in {2${900 + i}|date*} ok"), false))
    }
    val golden = evidences.map { case (e, l) => e.evidence_id -> l }.toMap
    val candidates = evidences.map(_._1).toDF()
    val seed = evidences.take(6)
      .map { case (e, l) => (e.evidence_id, l) }
      .toDF("evidence_id", "label")
    val goldenB = spark.sparkContext.broadcast(golden)
    val oracle = (questions: org.apache.spark.sql.DataFrame) => {
      val g = goldenB.value
      val ids = questions.select("evidence_id").as[String].collect()
      ids.map(id => (id, g(id))).toSeq.toDF("evidence_id", "label")
    }

    val dir = Files.createTempDirectory("graft-al").toString
    val r1 = ActiveLoop.run(spark, dir, candidates, seed, oracle,
      maxRounds = 1, answersPerRound = 4)
    assert(r1.head.nLabeled > 6)

    // resume: a second invocation picks up the existing labels checkpoint
    val r2 = ActiveLoop.run(spark, dir, candidates, seed, oracle,
      maxRounds = 1, answersPerRound = 4)
    assert(r2.head.nLabeled >= r1.head.nLabeled)
    assert(spark.read.parquet(s"$dir/labels").count() == r2.head.nLabeled)

    // NEWEST WINS: an annotator re-answering an already-labeled evidence
    // flips its stored label instead of keeping an arbitrary duplicate
    val target = evidences.head._1.evidence_id
    val before = spark.read.parquet(s"$dir/labels")
      .where($"evidence_id" === target).select("label")
      .as[Boolean].head()
    val flipOracle = (_: org.apache.spark.sql.DataFrame) =>
      Seq((target, !before)).toDF("evidence_id", "label")
    ActiveLoop.run(spark, dir, candidates, seed, flipOracle,
      maxRounds = 1, answersPerRound = 1)
    val after = spark.read.parquet(s"$dir/labels")
      .where($"evidence_id" === target)
    assert(after.count() == 1)
    assert(after.select("label").as[Boolean].head() == !before)
  }
}
