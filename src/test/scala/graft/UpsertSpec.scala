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

  test("scd2: versions chain, deletes close without emitting, open row is current") {
    // key 1: v1@10 → v2@20 → DELETE@30   (two closed versions, none open)
    // key 2: v1@15                        (one open version)
    val changes = Seq(
      (1L, "UPSERT", "a1", 1.0, 10L, 100L),
      (1L, "UPSERT", "a2", 2.0, 20L, 101L),
      (1L, "DELETE", "xx", 0.0, 30L, 102L),
      (2L, "UPSERT", "b1", 9.0, 15L, 103L))
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val out = Upsert.scd2FromChanges(changes, "k", Seq("name", "bal"),
      "op", "ord", "tie")
      .select("k", "name", "valid_from", "valid_to", "is_current")
      .as[(Long, String, Long, Option[Long], Int)].collect().toSet
    assert(out == Set(
      (1L, "a1", 10L, Some(20L), 0),
      (1L, "a2", 20L, Some(30L), 0), // closed BY the delete, which emits nothing
      (2L, "b1", 15L, None, 1)))
  }

  test("scd2 snapshotAt reconstructs the table at any past moment") {
    val changes = Seq(
      (1L, "UPSERT", "a1", 1.0, 10L, 100L),
      (1L, "UPSERT", "a2", 2.0, 20L, 101L),
      (1L, "DELETE", "xx", 0.0, 30L, 102L),
      (2L, "UPSERT", "b1", 9.0, 15L, 103L))
      .toDF("k", "op", "name", "bal", "ord", "tie")
    val hist = Upsert.scd2FromChanges(changes, "k", Seq("name", "bal"),
      "op", "ord", "tie")
    def at(ts: Long) = Upsert.snapshotAt(hist, ts)
      .select("k", "name").as[(Long, String)].collect().toSet
    assert(at(5L) == Set.empty)                       // before everything
    assert(at(12L) == Set((1L, "a1")))                // v1 live, key 2 absent
    assert(at(20L) == Set((1L, "a2"), (2L, "b1")))    // boundary: new version
    assert(at(35L) == Set((2L, "b1")))                // key 1 deleted
  }

  test("scd2: rebuild from full log == prior history + incremental tail per key") {
    // valid_to depends only on the key's next change, so folding a later
    // day's changes yields the same rows as rebuilding from everything —
    // the property that makes nightly incremental application sound.
    val day1 = Seq((1L, "UPSERT", "a1", 1.0, 10L, 100L))
    val day2 = Seq((1L, "UPSERT", "a2", 2.0, 20L, 101L))
    val full = Upsert.scd2FromChanges((day1 ++ day2)
        .toDF("k", "op", "name", "bal", "ord", "tie"),
      "k", Seq("name", "bal"), "op", "ord", "tie")
      .as[(Long, String, Double, Long, Option[Long], Int)].collect().toSet
    assert(full == Set(
      (1L, "a1", 1.0, 10L, Some(20L), 0),
      (1L, "a2", 2.0, 20L, None, 1)))
  }
}
