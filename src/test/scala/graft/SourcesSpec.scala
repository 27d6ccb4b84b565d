package graft

import java.nio.file.Files
import graft.sources.Sources

/** S1/S2/S4/S5/S6 scan & sink fixtures (reference `iepy/utils.py:92-135`,
  * `gazettes_loader.py`, `ner/literal.py:10-36`, `data/output.py`). */
class SourcesSpec extends SparkSpec {

  private def tmp(): String =
    Files.createTempDirectory("graft-src").toString

  test("S1 corpus CSV: header, malformed skipped, dup doc_id first wins") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/corpus.csv"),
      "document_id,document_text\n" +
        "d1,first text\n" +
        "d2,other text\n" +
        "d1,overwriting text\n")
    val df = Sources.corpusCsv(spark, s"$dir/corpus.csv")
    val m = df.collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(m == Map("d1" -> "first text", "d2" -> "other text"))
  }

  test("S2 gazette CSV: trimmed, last duplicate wins downstream") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/gz.csv"),
      "literal,class\n parse_header , FUNCTION\nauth_core,MODULE\n")
    val gz = Sources.gazetteCsv(spark, s"$dir/gz.csv")
    assert(gz.contains(("parse_header", "FUNCTION")))
    assert(gz.contains(("auth_core", "MODULE")))
  }

  test("S4 name files: i-th label tags i-th file; later file wins") {
    val dir = tmp()
    Files.writeString(java.nio.file.Paths.get(s"$dir/f1.txt"),
      "HIV\nHepatitis C\ndrooling\n")
    Files.writeString(java.nio.file.Paths.get(s"$dir/f2.txt"),
      "MRI\ndrooling\n")
    val entries = Sources.nameFiles(
      Seq("DISEASE", "MEDICAL_TEST"), Seq(s"$dir/f1.txt", s"$dir/f2.txt"))
    // LiteralNer map semantics: last entry wins
    assert(entries.toMap.apply("drooling") == "MEDICAL_TEST")
    assert(entries.toMap.apply("HIV") == "DISEASE")
  }

  test("S5 predictions CSV sink: header + refuse overwrite") {
    import spark.implicits._
    val dir = tmp() + "/preds"
    val df = Seq(("e1", true), ("e2", false)).toDF("evidence_id", "label")
    Sources.predictionsCsv(df, dir)
    val lines = spark.read.text(s"$dir/*.csv").collect().map(_.getString(0))
    assert(lines.contains("Candidate evidence id,Relation present"))
    assert(lines.contains("e1,true"))
    intercept[Throwable] { Sources.predictionsCsv(df, dir) }
  }

  test("S6 predictions table upsert is idempotent, newest wins per key") {
    import spark.implicits._
    val dir = tmp() + "/labels"
    val p1 = Seq(("e1", true), ("e2", false)).toDF("evidence_id", "label")
    Sources.predictionsTable(spark, p1, "calls", dir, runTs = 100L)
    Sources.predictionsTable(spark, p1, "calls", dir, runTs = 100L) // rerun
    val after = spark.read.parquet(dir)
    assert(after.count() == 2) // idempotent on same (evidence, judge)
    val p2 = Seq(("e1", false)).toDF("evidence_id", "label")
    Sources.predictionsTable(spark, p2, "calls", dir, runTs = 200L)
    assert(spark.read.parquet(dir).count() == 3) // new judge -> appended
  }
}
