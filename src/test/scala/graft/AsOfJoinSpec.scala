package graft

import graft.operators.AsOfJoin
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val snaps = Seq(
    (0L, 100L, "s1", 10),
    (0L, 200L, "s2", 20),
    (0L, 300L, "s3", 30),
    (1L, 150L, "t1", 99)).toDF("tid", "tsn", "snap_id", "odds")

  private val probes = Seq(
    (0L, 50L, 1L),   // before any snapshot → null payload
    (0L, 200L, 2L),  // equal ts → inclusive match s2
    (0L, 250L, 3L),  // between → s2
    (0L, 999L, 4L),  // after all → s3
    (1L, 160L, 5L),  // other key → t1
    (2L, 500L, 6L))  // key with no snapshots → null
    .toDF("tid", "tsn", "event_id")

  test("as-of semantics: latest snapshot ≤ probe ts, inclusive, per key") {
    val out = AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"))
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    assert(out == Map(1L -> None, 2L -> Some("s2"), 3L -> Some("s2"),
      4L -> Some("s3"), 5L -> Some("t1"), 6L -> None))
  }

  test("probe count preserved (left-join cardinality)") {
    val out = AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"))
    assert(out.count() == probes.count())
  }

  test("forward direction picks the earliest snapshot ≥ probe ts") {
    val out = AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"), direction = "forward")
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    assert(out == Map(1L -> Some("s1"), 2L -> Some("s2"), 3L -> Some("s3"),
      4L -> None, 5L -> None, 6L -> None))
  }

  test("tolerance nulls matches farther than the bound, keeps the row") {
    val out = AsOfJoin.lastValueAsOf(probes, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"), tolerance = Some(60L))
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    // probe 3 (ts 250) is 50 from s2 (200): kept; probe 4 (ts 999) is 699
    // from s3 (300): nulled; row count unchanged.
    assert(out == Map(1L -> None, 2L -> Some("s2"), 3L -> Some("s2"),
      4L -> None, 5L -> Some("t1"), 6L -> None))
  }

  test("nearest direction picks the closer side; ties prefer backward") {
    val nearProbes = Seq(
      (0L, 50L, 1L),   // no backward; forward s1 (d=50)
      (0L, 240L, 2L),  // back s2 d=40 < fwd s3 d=60 → s2
      (0L, 260L, 3L),  // back s2 d=60 > fwd s3 d=40 → s3
      (0L, 250L, 4L),  // exact tie d=50 → backward s2
      (0L, 999L, 5L),  // no forward; backward s3
      (2L, 500L, 6L))  // no snapshots at all → null
      .toDF("tid", "tsn", "event_id")
    val out = AsOfJoin.lastValueAsOf(nearProbes, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"), direction = "nearest")
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    assert(out == Map(1L -> Some("s1"), 2L -> Some("s2"), 3L -> Some("s3"),
      4L -> Some("s2"), 5L -> Some("s3"), 6L -> None))
  }

  test("nearest + tolerance nulls a nearest match that is still too far") {
    val p = Seq((0L, 50L, 1L), (0L, 240L, 2L)).toDF("tid", "tsn", "event_id")
    val out = AsOfJoin.lastValueAsOf(p, snaps, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds"),
      direction = "nearest", tolerance = Some(45L))
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    // probe 1's nearest (s1, d=50) exceeds 45 → nulled, row kept;
    // probe 2's nearest (s2, d=40) survives.
    assert(out == Map(1L -> None, 2L -> Some("s2")))
  }

  test("nearest agrees with a JVM brute force on seeded random data") {
    val rnd = new scala.util.Random(11)
    // unique snapshot ts per key (the documented contract)
    val snapRows = (0 until 3).flatMap { k =>
      rnd.shuffle((0 until 500).toList).take(40).map(t =>
        (k.toLong, t.toLong * 2, s"s$k-$t", t))
    }
    val probeRows = (0 until 120).map { i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(1000).toLong, i.toLong)
    }
    val out = AsOfJoin.lastValueAsOf(
      probeRows.toDF("tid", "tsn", "event_id"),
      snapRows.toDF("tid", "tsn", "snap_id", "odds"),
      Seq("tid"), "tsn", Seq("event_id"), Seq("snap_id", "odds"),
      direction = "nearest")
      .select("event_id", "snap_id")
      .collect().map(r => r.getAs[Long]("event_id") ->
        Option(r.getAs[String]("snap_id"))).toMap
    val byKey = snapRows.groupBy(_._1)
    probeRows.foreach { case (tid, ts, eid) =>
      val expected = byKey.get(tid).flatMap { ss =>
        // min |Δts|; tie → smaller snapshot ts (the backward side)
        ss.sortBy(s => (math.abs(s._2 - ts), s._2)).headOption.map(_._3)
      }
      assert(out(eid) == expected, s"probe $eid (tid=$tid ts=$ts)")
    }
  }

  test("null payload field in latest snapshot is NOT backfilled from older snapshots") {
    // s2 (latest ≤ probe) carries a null odds; true ASOF returns (s2, null),
    // never a frankenrow (s2, 10) stitched from s1's odds.
    val snapsWithNull = Seq(
      (0L, 100L, Some("s1"), Some(10)),
      (0L, 200L, Some("s2"), None: Option[Int]))
      .toDF("tid", "tsn", "snap_id", "odds")
    val p = Seq((0L, 250L, 1L)).toDF("tid", "tsn", "event_id")
    val row = AsOfJoin.lastValueAsOf(p, snapsWithNull, Seq("tid"), "tsn",
      Seq("event_id"), Seq("snap_id", "odds")).collect().head
    assert(row.getAs[String]("snap_id") == "s2")
    assert(row.isNullAt(row.fieldIndex("odds")))
  }
}
