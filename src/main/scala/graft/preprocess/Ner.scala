package graft.preprocess

import scala.collection.mutable.ArrayBuffer
import graft.schema.Mention

/** Named-entity recognition over tokenized documents.
  *
  * Semantics from the reference:
  *  - literal gazetteer longest-match via prefix closure
  *    (`/root/reference/iepy/preprocess/ner/literal.py:6-77`)
  *  - per-token-tag run-grouping into occurrences
  *    (`/root/reference/iepy/preprocess/ner/stanford.py:33-79`)
  *  - combiners: concat / no-overlap (first NER wins) / kind-preference
  *    (`/root/reference/iepy/preprocess/ner/combiner.py`)
  *  - entity keying: gazette hits share identity by surface form; other
  *    hits are initially their own entity, keyed "{doc} {kind} {i} {j}"
  *    (`/root/reference/iepy/preprocess/stanford_preprocess.py:285-315`)
  *
  * These run inside `mapPartitions`/typed `map` on executors; the gazette
  * is small (dimension-table sized) and broadcast.
  */
trait Ner extends Serializable {
  /** Entities of one sentence: ((start, endExclusive), KIND). */
  def entities(sent: IndexedSeq[String]): Seq[((Int, Int), String)]
  /** Gazette-born matchers share entity identity by alias. */
  def fromGazette: Boolean = false
}

/** Exact multi-token gazetteer matcher; greedy longest match through the
  * prefix-closure set; on overlapping vocabularies the last-added literal's
  * label wins (reference `literal.py:21-26`). */
final class LiteralNer(entries: Seq[(String, String)]) extends Ner {
  // literal -> label; later entries win
  private val namesMap: Map[String, String] = entries.toMap
  private val prefixes: Set[String] = namesMap.keysIterator.flatMap { name =>
    val parts = name.split(" ")
    (1 to parts.length).map(i => parts.take(i).mkString(" "))
  }.toSet

  override def fromGazette: Boolean = true

  def entities(sent: IndexedSeq[String]): Seq[((Int, Int), String)] = {
    val out = ArrayBuffer.empty[((Int, Int), String)]
    var i = 0
    while (i < sent.length) {
      var j = i + 1
      var segment = sent.slice(i, j).mkString(" ")
      var prev = segment
      while (prefixes.contains(segment) && j <= sent.length) {
        j += 1
        prev = segment
        segment = sent.slice(i, j).mkString(" ")
      }
      namesMap.get(prev) match {
        case Some(label) if prev == sent.slice(i, j - 1).mkString(" ") =>
          out += (((i, j - 1), label)); i = j - 1
        case _ => i += 1
      }
    }
    out.toSeq
  }
}

/** Wraps a per-token tagger `token -> kind-or-O`; contiguous same-kind runs
  * (kind != "O") collapse into one occurrence (reference
  * `ner/stanford.py:33-79`). Used for regex/heuristic code NER. */
final class TagRunNer(tagToken: String => String) extends Ner {
  def entities(sent: IndexedSeq[String]): Seq[((Int, Int), String)] = {
    val out = ArrayBuffer.empty[((Int, Int), String)]
    var i = 0
    while (i < sent.length) {
      val kind = tagToken(sent(i))
      if (kind != "O") {
        var j = i + 1
        while (j < sent.length && tagToken(sent(j)) == kind) j += 1
        out += (((i, j), kind)); i = j
      } else i += 1
    }
    out.toSeq
  }
}

object NerRunner {

  /** Run one NER over a whole doc, producing global-offset mentions.
    * Mirrors `LiteralNERRunner.run_ner` (reference `literal.py:80-106`) +
    * the entity-keying rule (`stanford_preprocess.py:285-315`). */
  def run(
      ner: Ner,
      rank: Int,
      docId: String,
      tokens: Array[String],
      sentences: Array[Int]): Seq[Mention] = {
    val out = ArrayBuffer.empty[Mention]
    var s = 0
    while (s < sentences.length - 1) {
      val a = sentences(s); val b = sentences(s + 1)
      val sent: IndexedSeq[String] = tokens.slice(a, b).toIndexedSeq
      ner.entities(sent).foreach { case ((i, j), label) =>
        val name = sent.slice(i, j).mkString(" ")
        val kind = label.toUpperCase
        val off = a + i; val end = a + j
        val key =
          if (ner.fromGazette) name else s"$docId $kind $off $end"
        out += Mention(docId, off, end, kind, name.take(256), key,
          ner.fromGazette, rank, anaphora = false)
      }
      s += 1
    }
    out.toSeq
  }

  /** Plain combiner: concat, sort by offset (reference `combiner.py:4-45`;
    * stable sort preserves sub-NER order on ties). */
  def combine(results: Seq[Seq[Mention]]): Seq[Mention] =
    results.flatten.sortBy(_.offset)

  /** First NER wins; later mentions dropped if they overlap any accepted
    * one (reference `combiner.py:48-72`). */
  def combineNoOverlap(results: Seq[Seq[Mention]]): Seq[Mention] = {
    val acc = ArrayBuffer.empty[Mention]
    results.foreach { sub =>
      if (acc.isEmpty) acc ++= sub
      else sub.foreach { m =>
        val clash = acc.exists(e =>
          math.min(m.offset_end, e.offset_end) -
            math.max(m.offset, e.offset) > 0)
        if (!clash) acc += m
      }
    }
    acc.sortBy(_.offset).toSeq
  }

  /** On overlap keep best (kindRank, -length); unranked kinds worst;
    * earlier-NER tie-break (reference `combiner.py:75-126`). */
  def combineKindPreference(
      results: Seq[Seq[Mention]],
      rankOrder: Seq[String]): Seq[Mention] = {
    val kindRank = rankOrder.zipWithIndex.toMap
    val worst = rankOrder.length
    def crit(m: Mention): (Int, Int) =
      (kindRank.getOrElse(m.kind, worst), -(m.offset_end - m.offset))
    val sorted = combine(results).toArray
    if (sorted.isEmpty) return Nil
    val removed = java.util.Collections.newSetFromMap(
      new java.util.IdentityHashMap[Mention, java.lang.Boolean]())
    var prev = sorted(0)
    var k = 1
    while (k < sorted.length) {
      val eo = sorted(k)
      if (eo.offset < prev.offset_end) {
        val pc = crit(prev); val ec = crit(eo)
        val prevWins = pc._1 < ec._1 || (pc._1 == ec._1 && pc._2 <= ec._2)
        if (prevWins) removed.add(eo)
        else { removed.add(prev); prev = eo }
      } else prev = eo
      k += 1
    }
    sorted.filterNot(removed.contains).toSeq
  }

  /** Occurrence dedupe with precedence, replacing `set_ner_result`'s
    * arrival-order skip rule (reference `iepy/data/models.py:222-241`) with
    * a deterministic total order: for a given (doc, span), gazette-born
    * beats NER-born, then lower ner_rank wins. */
  def dedupe(mentions: Seq[Mention]): Seq[Mention] =
    mentions
      .groupBy(m => (m.doc_id, m.offset, m.offset_end))
      .valuesIterator
      .map(_.minBy(m => (!m.from_gazette, m.ner_rank)))
      .toSeq
      .sortBy(m => (m.doc_id, m.offset))
}
