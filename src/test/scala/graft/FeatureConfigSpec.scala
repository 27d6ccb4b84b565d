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

  test("F22: chunk_tag / iob_chain tree-walk features (lex_features.py:38-71)") {
    import graft.features.IobChunker
    // "The dog saw John in Paris ." -> DT NN VBD NNP IN NNP .
    val tags = Seq("DT", "NN", "VBD", "NNP", "IN", "NNP", ".")
    assert(IobChunker.chunks(tags).map(c => (c.label, c.start, c.end)) ==
      Seq((Some("NP"), 0, 2), (Some("VP"), 2, 3), (Some("NP"), 3, 4),
        (Some("PP"), 4, 5), (Some("NP"), 5, 6), (None, 6, 7)))
    // chunk_tag: O for root-level leaves, B/I-<chunk> inside chunks
    assert(IobChunker.chunkTags(tags) ==
      Seq("B-NP", "B-PP", "B-VP", "I-NP", "O"))
    // iob_chain: same walk along path[:-1] — the root-level leaf's chain
    // is "/".join([]) = "" exactly as the reference emits it
    assert(IobChunker.iobChains(tags) ==
      Seq("", "B-NP", "B-PP", "B-VP", "I-NP"))
    // empty + all-unchunked edges
    assert(IobChunker.chunkTags(Nil) == Nil)
    assert(IobChunker.chunkTags(Seq(".", ",")) == Seq("O"))
    assert(IobChunker.iobChains(Seq(".", ",")) == Seq(""))

    // registry path: available by reference name, NOT in the default set
    import spark.implicits._
    val df = Seq(MarkupDsl.evidence(
      "{John|person**} was born in {1950|date*} x")).toDF()
    val out = FeatureConfig.applyConfig(df, Seq("chunk_tag", "iob_chain"))
    val row = out.select("f_chunk_tag", "f_iob_chain").head
    assert(row.getSeq[String](0).nonEmpty)
    assert(row.getSeq[String](0).forall(t =>
      t == "O" || t.matches("[BI]-(NP|VP|PP)")))
    assert(!graft.features.Features
      .withDefaultFeatures(df).columns.contains("f_chunk_tag"))
  }

  test("syntactic_sentences analog: per-sentence shallow-parse s-expressions stored on Doc") {
    import graft.features.IobChunker
    // one sentence: chunked runs under their label, unchunked under S,
    // PTB bracket escaping on leaves
    val toks = Seq("The", "dog", "saw", "(", "John", ")", ".")
    val tags = Seq("DT", "NN", "VBD", "-LRB-", "NNP", "-RRB-", ".")
    assert(IobChunker.sexpr(toks, tags) ==
      "(S (NP (DT The) (NN dog)) (VP (VBD saw)) (-LRB- -LRB-) " +
        "(NP (NNP John)) (-RRB- -RRB-) (. .))")
    // doc layout: one parse per sentence boundary pair
    val docToks = Array("A", "runs", ".", "B", "sits", ".")
    val docTags = Array("NNP", "VBD", ".", "NNP", "VBD", ".")
    val parses = IobChunker.docParses(docToks, docTags, Array(0, 3, 6))
    assert(parses.length == 2)
    assert(parses(0) == "(S (NP (NNP A)) (VP (VBD runs)) (. .))")
    assert(parses(1) == "(S (NP (NNP B)) (VP (VBD sits)) (. .))")
    // populated by the pipeline's preprocess (models.py:86 analog)
    val raw = graft.schema.RawDoc("r", "p", "c", "scala",
      "Function parse_header_0 calls function emit_event_1 .\n")
    val bundle = graft.pipeline.Pipeline.preprocessDoc(raw,
      new graft.preprocess.LiteralNer(Seq(
        ("parse_header_0", "FUNCTION"), ("emit_event_1", "FUNCTION"))))
    assert(bundle.doc.parses.length == bundle.doc.sentences.length - 1)
    assert(bundle.doc.parses.forall(p =>
      p.startsWith("(S ") && p.endsWith(")")))
  }

  test("stored parse is consumable: tree walks equal the tag-derived F22 features") {
    import graft.features.IobChunker
    // round trip incl. PTB bracket escaping
    val toks = Seq("The", "dog", "saw", "(", "John", ")", ".")
    val tags = Seq("DT", "NN", "VBD", "-LRB-", "NNP", "-RRB-", ".")
    val p = IobChunker.sexpr(toks, tags)
    assert(IobChunker.leavesOf(p) == tags.zip(toks))
    assert(IobChunker.chunkTagsOfParse(p) == IobChunker.chunkTags(tags))
    assert(IobChunker.iobChainsOfParse(p) == IobChunker.iobChains(tags))
    // pipeline output: every stored sentence parse walks to the same
    // feature sets as the tag arrays it was built from
    val raw = graft.schema.RawDoc("r", "p", "c", "scala",
      "Function alpha_0 calls function beta_1 . Class Gamma2 extends class Delta3 .\n")
    val d = graft.pipeline.Pipeline.preprocessDoc(raw,
      new graft.preprocess.LiteralNer(Seq(
        ("alpha_0", "FUNCTION"), ("beta_1", "FUNCTION")))).doc
    d.sentences.sliding(2).zip(d.parses.iterator).foreach {
      case (Array(a, b), parse) =>
        val sTags = d.postags.slice(a, b).toSeq
        val sToks = d.tokens.slice(a, b).toSeq
        assert(IobChunker.leavesOf(parse).map(_._1) == sTags)
        assert(IobChunker.leavesOf(parse).map(_._2) == sToks)
        assert(IobChunker.chunkTagsOfParse(parse) ==
          IobChunker.chunkTags(sTags))
        assert(IobChunker.iobChainsOfParse(parse) ==
          IobChunker.iobChains(sTags))
      case _ => ()
    }
  }

  test("S3: lowercase-unless-acronym normalizer (literal.py:109-119)") {
    assert(Sources.toLowerNormalizer("The NASA Space Program") ==
      "the NASA space program")
    assert(Sources.toLowerNormalizer("IBM") == "IBM")
    assert(Sources.toLowerNormalizer("Plain Words") == "plain words")
  }
}
