package graft

import graft.functions.TextFns
import graft.operators.Sketch
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SketchSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private val depth = 4
  private val width = 64 // small width forces collisions — the interesting case

  private def toks = Tables.documents(spark, "/root/testdata/sf0.001")
    .select(explode(TextFns.tokens(col("text"))).as("term"))

  test("CMS estimate is an upper bound on the exact count, for every term") {
    val exact = toks.groupBy($"term").agg(count(lit(1)).as("n"))
    val cms = Sketch.countMin(toks, "term", depth, width)
    val est = Sketch.estimate(cms, exact, "term", depth, width)
    val bad = exact.join(est, "term").where($"cms_count" < $"n").count()
    assert(bad == 0, "CMS must never underestimate")
  }

  test("sketches merge by cell-wise sum: sketch(A ∪ B) == sketch(A) ⊕ sketch(B)") {
    val (a, b) = (toks.where(md5($"term") < "8"), toks.where(md5($"term") >= "8"))
    val merged = Sketch.countMin(a, "term", depth, width)
      .unionByName(Sketch.countMin(b, "term", depth, width))
      .groupBy($"row", $"bucket").agg(sum($"n").as("n"))
      .as[(Int, Long, Long)].collect().toSet
    val whole = Sketch.countMin(toks, "term", depth, width)
      .as[(Int, Long, Long)].collect().toSet
    assert(merged == whole)
  }

  test("sketch size is the grid, not the corpus") {
    val cells = Sketch.countMin(toks, "term", depth, width).count()
    assert(cells <= depth.toLong * width)
    assert(toks.count() > cells, "corpus must dwarf the sketch for the test to mean anything")
  }
}

class KllQuantilesSpec extends AnyFunSuite {
  private val spark = TestSpark.spark

  test("kll p50/p90 of a 100k shuffled stream are within the rank bound") {
    import org.apache.spark.sql.functions._
    // 0..99999 in hash-shuffled order over 8 partitions — true pX = X% of 1e5
    val df = spark.range(100000).repartition(8)
      .select(pmod(col("id") * 7919, lit(100000L)).cast("double").as("v"))
    val qs = graft.operators.Sketch.kllQuantiles(df, "v", 256, Seq(0.5, 0.9))
      .collect().head.getSeq[Double](0)
    // k=256, ~9 levels ⇒ bound ≈ 9·1e5/256 ≈ 3.5k ranks = 3.5% — assert 5%
    assert(math.abs(qs(0) - 50000.0) <= 5000.0, s"p50 off: ${qs(0)}")
    assert(math.abs(qs(1) - 90000.0) <= 5000.0, s"p90 off: ${qs(1)}")
  }

  test("kll aggregate plans as ObjectHashAggregate with a map-side partial") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000).select(col("id").cast("double").as("v"))
    val p = graft.operators.Sketch.kllQuantiles(df, "v", 64, Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate"),
      s"TypedImperativeAggregate should use the object hash agg path:\n$p")
    assert(p.contains("partial_kll_quantiles"),
      s"map-side partial must build sketches before the exchange:\n$p")
  }

  test("kll per-group: each group's estimate honors its own rank bound, one sketch per key") {
    import org.apache.spark.sql.functions._
    // 4 groups with disjoint ranges: group g holds g·1e5 .. g·1e5+24999 in
    // shuffled order, so per-group true p50 = g·1e5 + 12500
    val df = spark.range(100000).repartition(8)
      .select((col("id") % 4).as("g"),
        (col("id") % 4 * 100000L +
          pmod(col("id") * 7919, lit(25000L))).cast("double").as("v"))
    val out = graft.operators.Sketch.kllQuantilesBy(df, "g", "v", 256, Seq(0.5))
      .collect().map(r => r.getLong(0) -> r.getSeq[Double](1).head).toMap
    assert(out.keySet == Set(0L, 1L, 2L, 3L))
    out.foreach { case (g, p50) =>
      // n=25k per group, k=256 ⇒ bound ≈ levels·n/k ≈ 0.7k ranks; assert 2k
      assert(math.abs(p50 - (g * 100000L + 12500.0)) <= 2000.0,
        s"group $g p50 off: $p50")
    }
    val p = graft.operators.Sketch.kllQuantilesBy(df, "g", "v", 256, Seq(0.5))
      .queryExecution.executedPlan.toString
    assert(p.contains("ObjectHashAggregate") && p.contains("partial_kll_quantiles"),
      s"grouped sketch must keep the map-side partial path:\n$p")
  }

  test("kll handles nulls and empty input like a SQL aggregate") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val mixed = Seq[Option[Double]](Some(1.0), None, Some(3.0)).toDF("v")
    val got = graft.operators.Sketch.kllQuantiles(mixed, "v", 64, Seq(0.5))
      .collect().head.getSeq[Double](0)
    assert(got == Seq(1.0)) // median of {1,3} at target rank ⌈0.5·2⌉=1
    val empty = spark.emptyDataFrame.select(lit(1.0).as("v")).where(lit(false))
    assert(graft.operators.Sketch.kllQuantiles(empty, "v", 64, Seq(0.5))
      .collect().head.isNullAt(0))
  }
}

/** Mergeable HLL shard sketches (Sketch.hllShardSketches): union over
  * disjoint shards ≡ one whole-corpus sketch, and the persisted-binary
  * incremental path. */
class HllShardSpec extends AnyFunSuite {
  import graft.operators.{Sketch, TextAnalysis}
  import graft.functions.TextFns
  import org.apache.spark.sql.functions._
  private val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def toks = TextAnalysis.assignShards(Tables.documents(spark, dir), 8)
    .select(col("shard"), col("doc_id"),
      explode(TextFns.tokens(col("text"))).as("token"))

  test("union of disjoint shard sketches estimates EXACTLY the whole-corpus sketch") {
    val merged = Sketch.hllMergedEstimate(
        Sketch.hllShardSketches(toks, "shard", "token"))
      .collect().head.getLong(0)
    val whole = toks
      .agg(hll_sketch_estimate(hll_sketch_agg(col("token"), 12)))
      .collect().head.getLong(0)
    assert(merged == whole, s"merged=$merged whole=$whole")
    val exact = toks.agg(countDistinct(col("token"))).collect().head.getLong(0)
    assert(math.abs(merged - exact) * 100 <= exact * 10,
      s"estimate $merged vs exact $exact outside 10%")
  }

  test("incremental: persisted batch sketches union with a new batch, no rescan") {
    val out = java.nio.file.Files.createTempDirectory("hll-idx").toString
    val batch1 = toks.where(col("doc_id") % 2 === 0)
    val batch2 = toks.where(col("doc_id") % 2 =!= 0)
    // Batch 1's sketches persist as the index; batch 1 rows are never read
    // again. Shard by the SAME column so batch 2's sketches align.
    Sketch.hllShardSketches(batch1, "shard", "token")
      .write.mode("overwrite").parquet(out)
    val stored = spark.read.parquet(out)
    val fresh = Sketch.hllShardSketches(batch2, "shard", "token")
    val inc = Sketch.hllMergedEstimate(stored.unionByName(fresh))
      .collect().head.getLong(0)
    val whole = Sketch.hllMergedEstimate(
        Sketch.hllShardSketches(toks, "shard", "token"))
      .collect().head.getLong(0)
    assert(inc == whole, s"incremental=$inc whole=$whole")
  }

  test("sketch artifact is small: bytes per shard bounded by the register array") {
    val sizes = Sketch.hllShardSketches(toks, "shard", "token")
      .select(length(col("sketch"))).collect().map(_.getInt(0))
    assert(sizes.length == 8)
    // HLL_8 at lgK=12: ~4 KB of registers + header, corpus-size-invariant.
    assert(sizes.forall(_ <= 8192), s"sketch sizes: ${sizes.toSeq}")
  }
}

/** Inclusion–exclusion overlap estimation (Sketch.hllOverlapEstimate). */
class HllOverlapSpec extends AnyFunSuite {
  import graft.operators.Sketch
  import org.apache.spark.sql.functions._
  private val spark = TestSpark.spark
  import spark.implicits._

  test("known overlap: ranges 0..999 and 500..1499 estimate ~500 within union-scale error") {
    val a = (0 until 1000).map(i => s"tok-$i").toDF("t")
    val b = (500 until 1500).map(i => s"tok-$i").toDF("t")
    val r = Sketch.hllOverlapEstimate(a, "t", b, "t").collect().head
    val (na, nb, nu, ni) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(math.abs(na - 1000) * 100 <= 1000 * 10, s"n_a_est=$na")
    assert(math.abs(nb - 1000) * 100 <= 1000 * 10, s"n_b_est=$nb")
    assert(math.abs(nu - 1500) * 100 <= 1500 * 10, s"n_union_est=$nu")
    assert(math.abs(ni - 500) * 100 <= 1500 * 10,
      s"n_intersect_est=$ni outside union-scale bound")
  }

  test("disjoint sets: estimate clamps at zero, never negative") {
    val a = (0 until 500).map(i => s"left-$i").toDF("t")
    val b = (0 until 500).map(i => s"right-$i").toDF("t")
    val ni = Sketch.hllOverlapEstimate(a, "t", b, "t")
      .select("n_intersect_est").collect().head.getLong(0)
    assert(ni >= 0, s"clamp failed: $ni")
    assert(ni * 100 <= 1000 * 10, s"disjoint estimate too large: $ni")
  }
}
