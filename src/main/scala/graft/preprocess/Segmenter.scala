package graft.preprocess

import scala.collection.mutable.ArrayBuffer
import graft.schema.{Doc, Mention, SegMention, Segment}

/** Sentence segmenter: one segment per sentence containing >= 2 wholly
  * contained entity occurrences; occurrences straddling the boundary are
  * excluded (reference `/root/reference/iepy/preprocess/segmenter.py:27-62`).
  *
  * Hydration (array slices, mention re-basing) happens here once,
  * denormalized (reference `/root/reference/iepy/data/models.py:363-390`),
  * so every downstream operator is join-free on the doc table.
  *
  * This is a per-document local computation: the pipeline co-partitions
  * mentions with docs (they're produced from docs in the same map) so no
  * shuffle is needed beyond the one `groupBy(doc_id)` when mentions arrive
  * from a separate table.
  */
object Segmenter {

  def segmentsOf(doc: Doc, mentions: Seq[Mention]): Seq[Segment] = {
    if (doc.sentences.length < 2) return Nil
    val sorted = mentions.sortBy(m => (m.offset, m.offset_end))
    val out = ArrayBuffer.empty[Segment]
    var s = 0
    while (s < doc.sentences.length - 1) {
      val a = doc.sentences(s); val b = doc.sentences(s + 1)
      val contained = sorted.filter(m => m.offset >= a && m.offset_end <= b)
      if (contained.size >= 2) {
        val segId = s"${doc.doc_id}:$a:$b"
        out += Segment(
          segment_id = segId,
          doc_id = doc.doc_id,
          offset = a,
          offset_end = b,
          tokens = doc.tokens.slice(a, b),
          lemmas = doc.lemmas.slice(a, b),
          postags = doc.postags.slice(a, b),
          mentions = contained.map(m => SegMention(
            eo_id = m.eoId,
            offset = m.offset - a,
            offset_end = m.offset_end - a,
            kind = m.kind,
            alias = m.alias,
            entity_key = m.entity_key,
            from_gazette = m.from_gazette)).toArray)
      }
      s += 1
    }
    out.toSeq
  }
}
