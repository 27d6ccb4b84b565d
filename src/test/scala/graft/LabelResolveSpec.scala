package graft

import graft.labels.LabelResolve
import graft.labels.LabelResolve.{JudgePriority, NewestWins, NoSolver}

/** Q5 label conflict resolution — fixtures from
  * `/root/reference/iepy/data/db.py:249-311` semantics. */
class LabelResolveSpec extends SparkSpec {

  private def labels(rows: (String, String, String, Boolean, Long)*) = {
    import spark.implicits._
    rows.map { case (ev, lbl, judge, machine, ts) =>
      (ev, lbl, "r", judge, machine, ts)
    }.toDF("evidence_id", "label", "relation", "judge", "by_machine",
      "modification_ts")
  }

  private def resolveMap(df: org.apache.spark.sql.DataFrame,
      solver: LabelResolve.ConflictSolver) =
    LabelResolve.resolve(df, "r", solver).collect()
      .map(r => r.getString(0) -> r.getBoolean(1)).toMap

  test("single answer wins; YE/NO map to booleans") {
    val df = labels(("e1", "YE", "j1", false, 1L), ("e2", "NO", "j1", false, 1L))
    assert(resolveMap(df, NoSolver) == Map("e1" -> true, "e2" -> false))
  }

  test("unanimous answers win") {
    val df = labels(("e1", "NO", "j1", false, 1L), ("e1", "NO", "j2", false, 2L))
    assert(resolveMap(df, NoSolver) == Map("e1" -> false))
  }

  test("conflict without solver drops the evidence") {
    val df = labels(("e1", "YE", "j1", false, 1L), ("e1", "NO", "j2", false, 2L))
    assert(resolveMap(df, NoSolver).isEmpty)
  }

  test("newest-wins solver picks latest modification (db.py:308-311)") {
    val df = labels(("e1", "YE", "j1", false, 1L), ("e1", "NO", "j2", false, 9L))
    assert(resolveMap(df, NewestWins) == Map("e1" -> false))
  }

  test("NS labels are uninformative and dropped") {
    val df = labels(("e1", "NS", "j1", false, 1L),
      ("e2", "NS", "j1", false, 1L), ("e2", "NS", "j2", false, 2L))
    assert(resolveMap(df, NewestWins).isEmpty)
  }

  test("SK and machine labels are excluded up front") {
    val df = labels(("e1", "SK", "j1", false, 1L),
      ("e2", "YE", "machine", true, 1L), ("e3", "YE", "j1", false, 1L))
    assert(resolveMap(df, NoSolver) == Map("e3" -> true))
  }

  test("judge-priority solver: earliest listed judge wins (db.py:296-306)") {
    val df = labels(("e1", "YE", "alice", false, 1L),
      ("e1", "NO", "bob", false, 2L))
    assert(resolveMap(df, JudgePriority(Seq("bob", "alice"))) ==
      Map("e1" -> false))
    assert(resolveMap(df, JudgePriority(Seq("alice", "bob"))) ==
      Map("e1" -> true))
  }

  test("judge-priority: conflict among only-unknown judges is unsolvable") {
    val df = labels(("e1", "YE", "x", false, 1L), ("e1", "NO", "y", false, 2L))
    assert(resolveMap(df, JudgePriority(Seq("alice"))).isEmpty)
  }
}
