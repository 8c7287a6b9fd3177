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

  test("scd2Fold: prior history + incremental tail == rebuild from the full log") {
    // Covers: updated key (1), deleted key (2), untouched key (3), and a
    // key created only in the tail (4).
    val day1 = Seq(
      (1L, "UPSERT", "a1", 1.0, 10L, 100L),
      (2L, "UPSERT", "b1", 9.0, 15L, 103L),
      (3L, "UPSERT", "c1", 5.0, 12L, 104L))
    val day2 = Seq(
      (1L, "UPSERT", "a2", 2.0, 20L, 105L),
      (2L, "DELETE", "xx", 0.0, 25L, 106L),
      (4L, "UPSERT", "d1", 7.0, 30L, 107L))
    def df(rows: Seq[(Long, String, String, Double, Long, Long)]) =
      rows.toDF("k", "op", "name", "bal", "ord", "tie")
    def rows(d: org.apache.spark.sql.DataFrame) =
      d.as[(Long, String, Double, Long, Option[Long], Int)].collect().toSet
    val folded = rows(Upsert.scd2Fold(
      Upsert.scd2FromChanges(df(day1), "k", Seq("name", "bal"), "op", "ord", "tie"),
      df(day2), "k", Seq("name", "bal"), "op", "ord", "tie"))
    val rebuilt = rows(Upsert.scd2FromChanges(df(day1 ++ day2),
      "k", Seq("name", "bal"), "op", "ord", "tie"))
    assert(folded == rebuilt)
    assert(rebuilt.contains((3L, "c1", 5.0, 12L, None, 1)), "untouched key stays open")
    assert(!rebuilt.exists(r => r._1 == 2L && r._5.isEmpty), "deleted key fully closed")
  }
}

/** Dataset-version diff (Upsert.snapshotDiff). */
class SnapshotDiffSpec extends AnyFunSuite {
  import graft.operators.Upsert
  import org.apache.spark.sql.functions._
  private val spark = TestSpark.spark
  import spark.implicits._

  test("added/removed/changed/unchanged classification") {
    val a = Seq((1L, "x", "en"), (2L, "y", "en"), (3L, "z", "de"))
      .toDF("k", "t", "l")
    val b = Seq((2L, "y", "en"), (3L, "z CHANGED", "de"), (4L, "w", "fr"))
      .toDF("k", "t", "l")
    val got = Upsert.snapshotDiff(a, b, "k", Seq("t", "l"))
      .select("k", "status").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged", 3L -> "changed",
      4L -> "added"))
  }

  test("length-prefixed fingerprint: no cross-field collisions; null ≡ \"null\" is the one documented collision") {
    // ("ab","c") vs ("a","bc"): naive space-concat would collide; the
    // length prefix keeps them apart.
    val a = Seq((1L, "ab", "c")).toDF("k", "t", "l")
    val b = Seq((1L, "a", "bc")).toDF("k", "t", "l")
    assert(Upsert.snapshotDiff(a, b, "k", Seq("t", "l"))
      .select("status").as[String].head() == "changed")
    // a real null differs from the literal string "null"... by length
    // alone they match ("null" vs null -> both render "null" with len 4),
    // so the contract is: null and "null" are NOT distinguished — pinned
    // here so nobody assumes otherwise.
    val an = Seq((1L, Option.empty[String], "l")).toDF("k", "t", "l")
    val bn = Seq((1L, Option("null"), "l")).toDF("k", "t", "l")
    assert(Upsert.snapshotDiff(an, bn, "k", Seq("t", "l"))
      .select("status").as[String].head() == "unchanged")
  }
}

class IncrementalAggSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def ordersDf(rows: Seq[(Long, Long, Double, String)]) = {
    import org.apache.spark.sql.functions._
    rows.toDF("o_orderkey", "o_custkey", "o_totalprice", "d")
      .withColumn("o_orderdate", col("d").cast("timestamp")).drop("d")
  }

  test("IncrementalAgg: merged sliced state == state built in one pass, any grouping") {
    import graft.operators.IncrementalAgg
    val rnd = new scala.util.Random(11)
    val rows = (1L to 200L).map { i =>
      (i, rnd.nextInt(12).toLong, rnd.nextInt(100000) / 100.0,
        f"199${rnd.nextInt(5)}-0${rnd.nextInt(9) + 1}-1${rnd.nextInt(9)} 00:00:00")
    }
    val full = IncrementalAgg.finalizeState(
      IncrementalAgg.merge(Seq(IncrementalAgg.orderState(ordersDf(rows)))))
      .collect().map(_.toSeq).toSet
    // three disjoint arbitrary slices, merged flat
    val slices = rows.grouped(70).map(s => IncrementalAgg.orderState(ordersDf(s))).toSeq
    val flat = IncrementalAgg.finalizeState(IncrementalAgg.merge(slices))
      .collect().map(_.toSeq).toSet
    assert(flat == full)
    // associativity: merge((a+b)) then + c ≡ flat
    val nested = IncrementalAgg.finalizeState(IncrementalAgg.merge(Seq(
      IncrementalAgg.merge(slices.take(2)), slices(2))))
      .collect().map(_.toSeq).toSet
    assert(nested == full)
    // an empty batch is a no-op
    val withEmpty = IncrementalAgg.finalizeState(IncrementalAgg.merge(
      slices :+ IncrementalAgg.orderState(ordersDf(rows).limit(0))))
      .collect().map(_.toSeq).toSet
    assert(withEmpty == full)
  }

  test("IncrementalAgg: per-key HLL distinct state merges without accuracy loss") {
    import graft.operators.IncrementalAgg
    val rnd = new scala.util.Random(5)
    // values shared ACROSS batches — exact per-batch counts would over-count
    val rows = (1 to 3000).map(i =>
      (s"k${i % 4}", s"v${rnd.nextInt(500)}")).toDF("key", "value")
      .withColumnRenamed("key", "kc")
      .select(org.apache.spark.sql.functions.col("kc").as("k"),
        org.apache.spark.sql.functions.col("value"))
    val slices = Seq(
      rows.where("hash(value) % 3 = 0"),
      rows.where("hash(value) % 3 = 1"),
      rows.where("hash(value) % 3 != 0 AND hash(value) % 3 != 1"))
    val merged = IncrementalAgg.finalizeDistinct(IncrementalAgg.mergeDistinct(
        slices.map(s => IncrementalAgg.distinctState(s, "k", "value"))))
      .as[(String, Long)].collect().toMap
    // At low cardinality sketch-mode promotion (coupon → dense) can happen
    // inside the union but not in the single whole-data sketch, so exact
    // register equality is NOT guaranteed here (measured: 399 vs 398 on
    // this corpus) — the dense-mode bit-equality claim lives in
    // HllShardSpec where cardinality forces every sketch dense. The
    // incremental-maintenance contract is the ESTIMATE envelope:
    val whole = IncrementalAgg.finalizeDistinct(IncrementalAgg.mergeDistinct(
        Seq(IncrementalAgg.distinctState(rows, "k", "value"))))
      .as[(String, Long)].collect().toMap
    for ((k, est) <- merged)
      assert(math.abs(est - whole(k)) * 100 <= math.max(whole(k), 1) * 2,
        s"$k: merged $est vs whole ${whole(k)} differ by more than 2%")
    val exact = rows.groupBy("k")
      .agg(org.apache.spark.sql.functions.countDistinct("value").as("n"))
      .as[(String, Long)].collect().toMap
    for ((k, est) <- merged)
      assert(math.abs(est - exact(k)) * 100 <= exact(k) * 9,
        s"$k: est $est vs exact ${exact(k)} outside the 9% envelope")
  }

  test("IncrementalAgg: money merges as exact cents, never floats") {
    import graft.operators.IncrementalAgg
    // 0.1-style doubles that would drift under float summation order
    val rows = (1L to 100L).map(i => (i, 1L, 0.1, "1999-01-01 00:00:00"))
    val out = IncrementalAgg.finalizeState(IncrementalAgg.merge(
      rows.grouped(7).map(s => IncrementalAgg.orderState(ordersDf(s))).toSeq))
      .collect()
    assert(out.length == 1)
    assert(out(0).getAs[Double]("sum_total") == 10.0) // exactly, via cents
    assert(out(0).getAs[Long]("avg_cents") == 10L)
  }
}
