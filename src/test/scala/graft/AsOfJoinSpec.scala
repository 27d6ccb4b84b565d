package graft

import graft.relational.AsOfJoin

/** As-of join semantics: latest quote at-or-before each fact per key,
  * inclusive at equal times, highest-id tiebreak, null when no quote
  * qualifies. (The q13 oracle additionally proves equivalence with
  * DuckDB's native ASOF LEFT JOIN on the driver tables.) */
class AsOfJoinSpec extends SparkSpec {

  test("latest at-or-before per key; inclusive ties -> highest id; no match -> null") {
    import spark.implicits._
    val facts = Seq((100L, 1L, 10L), (101L, 1L, 5L), (102L, 2L, 3L))
      .toDF("fid", "k", "t")
    val quotes = Seq((200L, 1L, 5L), (201L, 1L, 5L), (202L, 1L, 9L),
      (203L, 3L, 1L)).toDF("qid", "k", "t")
    val out = AsOfJoin.asOf(facts, quotes, "k", "t", "t", "fid", "qid")
    assert(out.columns.toSeq == Seq("fid", "k", "prev_qid"))
    val m = out.collect()
      .map(r => r.getLong(0) -> Option(r.get(2)).map(_.asInstanceOf[Long]))
      .toMap
    assert(m(100L) == Some(202L)) // quotes at t=5,5,9 -> latest is 9
    assert(m(101L) == Some(201L)) // inclusive t=5 tie -> highest qid
    assert(m(102L) == None)       // key 2 has no quotes
  }

  test("a fact earlier than every quote of its key gets null") {
    import spark.implicits._
    val facts = Seq((1L, 7L, 1L)).toDF("fid", "k", "t")
    val quotes = Seq((9L, 7L, 2L)).toDF("qid", "k", "t")
    val m = AsOfJoin.asOf(facts, quotes, "k", "t", "t", "fid", "qid")
      .collect().head
    assert(m.isNullAt(2))
  }
}
