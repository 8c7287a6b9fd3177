package graft

import graft.operators.Upsert
import org.scalatest.funsuite.AnyFunSuite

class UpsertSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val base = Seq(
    (1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0))
    .toDF("k", "name", "bal")

  test("latest change per key wins; deletes drop; untouched pass through") {
    val changes = Seq(
      (1L, "UPSERT", "alice2", 11.0, 100L, 1L), // superseded
      (1L, "UPSERT", "alice3", 12.0, 200L, 2L), // winner for k=1
      (2L, "DELETE", null, 0.0, 150L, 3L),      // drops bob
      (4L, "UPSERT", "dave", 40.0, 120L, 4L),   // fresh insert
      (5L, "DELETE", null, 0.0, 130L, 5L))      // delete of absent key: no-op
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val out = Upsert.applyChanges(base, changes, "k", Seq("name", "bal"),
      "op", "ord", "tie").as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "alice3", 12.0), (3L, "carol", 30.0), (4L, "dave", 40.0)))
  }

  test("tie on ord resolves by the tie-break column") {
    val changes = Seq(
      (1L, "UPSERT", "low", 1.0, 100L, 1L),
      (1L, "DELETE", null, 0.0, 100L, 2L)) // same ord, higher tie ⇒ wins
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val out = Upsert.applyChanges(base, changes, "k", Seq("name", "bal"),
      "op", "ord", "tie").as[(Long, String, Double)].collect().toSet
    assert(out == Set((2L, "bob", 20.0), (3L, "carol", 30.0)))
  }

  test("unknown op values are ignored, never treated as deletes") {
    val changes = Seq(
      (1L, "NOOP", "ghost", 0.0, 999L, 9L),   // must not shadow or delete
      (2L, "UPSERT", "bob2", 21.0, 100L, 1L))
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val out = Upsert.applyChanges(base, changes, "k", Seq("name", "bal"),
      "op", "ord", "tie").as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "alice", 10.0), (2L, "bob2", 21.0), (3L, "carol", 30.0)))
  }

  test("empty change log is the identity") {
    val changes = Seq.empty[(Long, String, String, Double, Long, Long)]
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val out = Upsert.applyChanges(base, changes, "k", Seq("name", "bal"),
      "op", "ord", "tie").as[(Long, String, Double)].collect().toSet
    assert(out == Set((1L, "alice", 10.0), (2L, "bob", 20.0), (3L, "carol", 30.0)))
  }
}
