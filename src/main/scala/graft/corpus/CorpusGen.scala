package graft.corpus

import java.security.MessageDigest
import org.apache.spark.sql.{Dataset, SparkSession}
import graft.schema.RawDoc

/** Deterministic synthetic source-code corpus (north-rule input shape:
  * repo, path, commit, lang, content) with planted entity mentions and
  * relations, so golden triples are known by construction (SURVEY §7.1
  * step 1). No external data; seeded per-row so generation is
  * embarrassingly parallel and identical at any partitioning.
  *
  * Facts planted per document (as doc-comment sentences):
  *  - "Function F calls function G ."          -> (F, calls, G)
  *  - "Function F is defined in module M ."    -> (F, defined_in, M)
  *  - camelCase subject variant of `calls` exercising NER-born mention
  *    canonicalization: "Function CamelF calls function G ."
  *  - distractors that must NOT produce triples.
  *
  * sha256(content) is carried per row (BASELINE input_hint invariant).
  */
object CorpusGen {

  final case class GenDoc(
      repo: String, path: String, commit: String, lang: String,
      content: String, content_sha256: String,
      facts: Array[(String, String, String)])

  def numDocs(sf: Double): Int = math.max(20, (sf * 200000).toInt)

  /** Gazette entries derived from the same vocabulary: every snake_case
    * function and module name. Deterministic in sf only. */
  def gazette(sf: Double): Seq[(String, String)] = {
    val n = numDocs(sf)
    val nFun = math.max(40, n / 4)
    val nMod = math.max(10, n / 20)
    (0 until nFun).map(i => (funName(i), "FUNCTION")) ++
      (0 until nMod).map(i => (modName(i), "MODULE"))
  }

  def funName(i: Int): String = {
    val verbs = Array("parse", "emit", "read", "write", "build", "score",
      "merge", "split", "load", "dump")
    val nouns = Array("header", "event", "token", "graph", "index",
      "buffer", "record", "schema", "chunk", "frame")
    s"${verbs(i % verbs.length)}_${nouns((i / verbs.length) % nouns.length)}_$i"
  }

  def camel(snake: String): String =
    snake.split("_").map(w =>
      if (w.nonEmpty && w.head.isDigit) w else w.capitalize).mkString("")

  def modName(i: Int): String = {
    val a = Array("auth", "data", "net", "core", "util", "api", "db",
      "log", "fs", "ml")
    val b = Array("core", "utils", "service", "engine", "layer")
    s"${a(i % a.length)}_${b((i / a.length) % b.length)}_$i"
  }

  private val hexChars = "0123456789abcdef".toCharArray
  def sha256(s: String): String = {
    val d = MessageDigest.getInstance("SHA-256").digest(s.getBytes("UTF-8"))
    val out = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      out(i * 2) = hexChars((d(i) >> 4) & 0xf)
      out(i * 2 + 1) = hexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Generate one document deterministically from (seed, index). */
  def genOne(sf: Double, seed: Long, idx: Long): GenDoc = {
    val n = numDocs(sf)
    val nFun = math.max(40, n / 4)
    val nMod = math.max(10, n / 20)
    val rnd = new java.util.Random(seed * 1000003L + idx * 7919L)
    val nSent = 20 + rnd.nextInt(20)
    val sb = new StringBuilder
    val facts = scala.collection.mutable.ArrayBuffer.empty[(String, String, String)]
    sb.append("// Auto-generated module documentation .\n")
    var s = 0
    while (s < nSent) {
      val fi = rnd.nextInt(nFun)
      var gi = rnd.nextInt(nFun)
      if (gi == fi) gi = (gi + 1) % nFun // self-loops would emit
      // (f, calls, f) via two distinct occurrences; keep golden exact
      val f = funName(fi)
      val g = funName(gi)
      val m = modName(rnd.nextInt(nMod))
      rnd.nextInt(8) match {
        case 0 | 1 =>
          sb.append(s"Function $f calls function $g .\n")
          facts += ((f, "calls", g))
        case 2 =>
          sb.append(s"Function $f is defined in module $m .\n")
          facts += ((f, "defined_in", m))
        case 3 =>
          // camelCase subject -> NER-born mention, canonicalized back
          val cf = camel(f)
          sb.append(s"Function $cf calls function $g .\n")
          facts += ((f, "calls", g))
        case 4 =>
          sb.append(s"Function $f never calls function $g .\n")
        case 5 =>
          sb.append(s"Module $m was reviewed and module $m is stable .\n")
        case 6 =>
          sb.append(s"The helper $f remains internal to this file .\n")
        case _ =>
          sb.append("This line has no entities at all .\n")
      }
      s += 1
    }
    val content = sb.toString
    val langs = Array("scala", "python", "java", "go", "rust")
    GenDoc(
      repo = s"repo_${(idx % math.max(5, n / 50)).toInt}",
      path = s"src/gen/file_$idx.src",
      commit = sha256(s"commit:$seed:$idx").take(12),
      lang = langs((idx % langs.length).toInt),
      content = content,
      content_sha256 = sha256(content),
      facts = facts.distinct.toArray)
  }

  /** Distributed generation; identical content for any partition count. */
  def generate(spark: SparkSession, sf: Double, seed: Long = 42L): Dataset[GenDoc] = {
    import spark.implicits._
    // 4x cores input splits: smooths stragglers (doc sizes vary 2x) the
    // same way small parquet splits do on a real scan; content is
    // seeded per-index so the partitioning never affects the data.
    // Capped at the doc count: a tiny corpus (kg_triples' sf=0.0002 is
    // 40 docs) on 128 splits pays ~90 empty tasks' scheduling + per-
    // partition rule-NFA compiles per stage — measured several seconds
    // of pure cold-start at local[32].
    val n = numDocs(sf)
    val parts = math.min(spark.sparkContext.defaultParallelism * 4, n)
    spark.range(0, n.toLong, 1, parts).map(i => genOne(sf, seed, i))
  }

  def rawDocs(spark: SparkSession, sf: Double, seed: Long = 42L): Dataset[RawDoc] = {
    import spark.implicits._
    generate(spark, sf, seed)
      .map(g => RawDoc(g.repo, g.path, g.commit, g.lang, g.content))
  }

  /** Golden (subj, pred, obj) set for the generated corpus. */
  def goldenTriples(spark: SparkSession, sf: Double, seed: Long = 42L) = {
    import spark.implicits._
    generate(spark, sf, seed)
      .flatMap(_.facts)
      .toDF("subj", "pred", "obj")
      .distinct()
  }
}
