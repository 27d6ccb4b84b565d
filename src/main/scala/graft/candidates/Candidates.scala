package graft.candidates

import scala.collection.mutable.ArrayBuffer
import graft.schema.{Evidence, Relation, Segment}
import graft.rules.Rules.TokenToMatch

/** Candidate-evidence generation (the relational core, reference
  * `/root/reference/iepy/data/models.py:401-479`,
  * `/root/reference/iepy/data/db.py:189-235`).
  *
  * Per segment: cross product of left-kind x right-kind occurrences,
  * excluding the identical occurrence (`models.py:432-436`); the kind-pair
  * filter (>=1 of each kind; >=2 if kinds equal, `models.py:454-479`) is
  * implied. Evidence ids are deterministic
  * (segment, left, right) keys so re-runs are pure dropDuplicates upserts
  * (`models.py:401-424` get-or-create recast, SURVEY §4.3).
  *
  * Segment-local: generation is a flatMap over the hydrated segment
  * Dataset — no join, no shuffle. Skew guard: pairs per segment are
  * bounded by sentence length squared; `maxPairsPerSegment` caps
  * pathological sentences (logged via metrics, not silently).
  */
object Candidates {

  val MaxPairsPerSegment = 256

  def evidencesOf(seg: Segment, relation: Relation): Seq[Evidence] =
    evidencesOfCounted(seg, relation)._1

  /** Like [[evidencesOf]] but also reports whether the segment hit the
    * pair cap (truncated=true means pairs were DROPPED — callers must
    * count these into a run metric; a silent cap is a correctness
    * hole on pathological sentences). */
  def evidencesOfCounted(seg: Segment,
      relation: Relation): (Seq[Evidence], Boolean) = {
    val lefts = seg.mentions.filter(_.kind == relation.leftKind)
    val rights = seg.mentions.filter(_.kind == relation.rightKind)
    if (lefts.isEmpty || rights.isEmpty) return (Nil, false)
    val shared = lefts.count(l => rights.exists(_.eo_id == l.eo_id))
    val potential = lefts.length.toLong * rights.length - shared
    val out = ArrayBuffer.empty[Evidence]
    var i = 0
    while (i < lefts.length && out.length < MaxPairsPerSegment) {
      var j = 0
      while (j < rights.length && out.length < MaxPairsPerSegment) {
        val l = lefts(i); val r = rights(j)
        if (l.eo_id != r.eo_id) {
          out += Evidence(
            evidence_id = s"${seg.segment_id}|${l.eo_id}|${r.eo_id}",
            segment_id = seg.segment_id,
            doc_id = seg.doc_id,
            left_eo = l.eo_id,
            right_eo = r.eo_id,
            left_offset = l.offset,
            left_end = l.offset_end,
            right_offset = r.offset,
            right_end = r.offset_end,
            left_key = l.entity_key,
            right_key = r.entity_key,
            relation = relation.name,
            tokens = seg.tokens,
            lemmas = seg.lemmas,
            postags = seg.postags,
            mentions = seg.mentions)
        }
        j += 1
      }
      i += 1
    }
    (out.toSeq, potential > MaxPairsPerSegment)
  }

  /** Enriched token sequence for the rule engine (reference
    * `rules.py:133-157`; per-token EO kinds from
    * `/root/reference/iepy/data/models.py:438-452`). */
  def tokensToMatch(ev: Evidence): IndexedSeq[TokenToMatch] = {
    val n = ev.tokens.length
    val out = new Array[TokenToMatch](n)
    var t = 0
    while (t < n) {
      var kinds = Set.empty[String]
      var isSubj = false
      var isObj = false
      var m = 0
      while (m < ev.mentions.length) {
        val mm = ev.mentions(m)
        if (t >= mm.offset && t < mm.offset_end) {
          kinds += mm.kind
          if (mm.eo_id == ev.left_eo) isSubj = true
          if (mm.eo_id == ev.right_eo) isObj = true
        }
        m += 1
      }
      out(t) = TokenToMatch(ev.tokens(t), ev.lemmas(t), ev.postags(t),
        kinds, isSubj, isObj)
      t += 1
    }
    out.toIndexedSeq
  }

  /** `in_between_offsets` gap semantics (reference
    * `/root/reference/iepy/extraction/features.py:259-267`): the span
    * strictly between the two EOs; touching/overlapping/nested spans
    * collapse to the smaller offset_end. */
  def inBetween(ev: Evidence): (Int, Int) = {
    val (aOff, aEnd) = (ev.right_offset, ev.right_end)
    val (bOff, bEnd) = (ev.left_offset, ev.left_end)
    if (aEnd <= bOff) (aEnd, bOff)
    else if (bEnd <= aOff) (bEnd, aOff)
    else {
      val e = math.min(aEnd, bEnd); (e, e)
    }
  }
}
