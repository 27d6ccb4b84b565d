package graft

import scala.collection.mutable.ArrayBuffer
import graft.schema.{Evidence, SegMention}

/** Port of the reference's EvidenceFactory markup DSL
  * (`/root/reference/tests/factories.py:141-245`): builds a hydrated
  * Evidence from one string. `{tokens|kind}` marks an entity occurrence;
  * `kind*` flags the right EO, `kind**` the left EO. POS defaults to the
  * DT/JJ/NN cycle and lemmas to lowercased tokens
  * (`/root/reference/tests/test_features.py:26-38`).
  */
object MarkupDsl {

  def evidence(markup: String,
      basePos: Seq[String] = Seq("DT", "JJ", "NN")): Evidence = {
    val tokens = ArrayBuffer.empty[String]
    val mentions = ArrayBuffer.empty[SegMention]
    var left: Option[Int] = None
    var right: Option[Int] = None
    var rest = markup
    while (rest.nonEmpty) {
      if (rest.startsWith("{")) {
        val closer = rest.indexOf("}")
        val entity = rest.substring(1, closer)
        rest = rest.substring(closer + 1).dropWhile(_ == ' ')
        val Array(eoText, kindRaw) = entity.split('|')
        val eoTokens = eoText.split(' ').filter(_.nonEmpty)
        val stars = kindRaw.count(_ == '*')
        val kind = kindRaw.replace("*", "").toUpperCase
        val off = tokens.length
        val m = SegMention(
          eo_id = s"doc:$off:${off + eoTokens.length}",
          offset = off,
          offset_end = off + eoTokens.length,
          kind = kind,
          alias = eoTokens.mkString(" "),
          entity_key = eoTokens.mkString(" "),
          from_gazette = false)
        mentions += m
        if (stars == 2) left = Some(mentions.length - 1)
        else if (stars == 1) right = Some(mentions.length - 1)
        tokens ++= eoTokens
      } else {
        val sp = rest.indexOf(' ')
        if (sp < 0) { if (rest.nonEmpty) tokens += rest; rest = "" }
        else {
          val t = rest.substring(0, sp)
          if (t.nonEmpty) tokens += t
          rest = rest.substring(sp + 1)
        }
      }
    }
    val toks = tokens.toArray
    val pos = Array.tabulate(toks.length)(i => basePos(i % basePos.length))
    val lemmas = toks.map(_.toLowerCase)
    val l = left.map(mentions.apply)
    val r = right.map(mentions.apply)
    Evidence(
      evidence_id = s"ev-${markup.hashCode.toHexString}",
      segment_id = "seg",
      doc_id = "doc",
      left_eo = l.map(_.eo_id).getOrElse(""),
      right_eo = r.map(_.eo_id).getOrElse(""),
      left_offset = l.map(_.offset).getOrElse(0),
      left_end = l.map(_.offset_end).getOrElse(0),
      right_offset = r.map(_.offset).getOrElse(0),
      right_end = r.map(_.offset_end).getOrElse(0),
      left_key = l.map(_.entity_key).getOrElse(""),
      right_key = r.map(_.entity_key).getOrElse(""),
      relation = "test",
      tokens = toks,
      lemmas = lemmas,
      postags = pos,
      mentions = mentions.toArray)
  }
}
