package graft

import graft.operators.EntityResolution
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class EntityResolutionSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletion neighborhood: string itself plus each single deletion, deduped") {
    val out = Seq("abca").toDF("s")
      .select(EntityResolution.deletionNeighborhood(col("s")))
      .as[Seq[String]].head()
    assert(out.toSet == Set("abca", "bca", "aca", "aba", "abc"))
    val empty = Seq("").toDF("s")
      .select(EntityResolution.deletionNeighborhood(col("s")))
      .as[Seq[String]].head()
    assert(empty == Seq(""))
  }

  test("Spark deletionNeighborhood == the JVM mirror SymmetricDeleteProps pins") {
    def nbhd(s: String): Set[String] =
      (0 to s.length).map {
        case 0 => s
        case i => s.substring(0, i - 1) + s.substring(i)
      }.toSet
    val rnd = new scala.util.Random(41)
    val samples = Seq("", "a", "ab#00", "zzzz") ++
      (1 to 20).map(_ => rnd.alphanumeric.take(1 + rnd.nextInt(20)).mkString)
    val got = samples.toDF("s")
      .select(col("s"), EntityResolution.deletionNeighborhood(col("s")).as("n"))
      .as[(String, Seq[String])].collect()
    got.foreach { case (s, n) => assert(n.toSet == nbhd(s), s"for '$s'") }
  }

  test("fuzzyPairs finds every deletion, insertion, and substitution at dist 1") {
    val left = Seq(
      (1L, "Northwind Research"), // substitution target
      (2L, "spark engine"),       // deletion target
      (3L, "graft"),              // insertion target
      (4L, "unrelated name")      // no partner
    ).toDF("id", "name")
    val right = Seq(
      (11L, "northwind resaarch"), // substitution (+case/space normalize)
      (12L, "spark engin"),        // deletion
      (13L, "grafts"),             // insertion
      (14L, "totally different")
    ).toDF("id", "name")
    val got = EntityResolution.fuzzyPairs(left, right)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 11L, 1), (2L, 12L, 1), (3L, 13L, 1)))
  }

  test("exactness against naive all-pairs on a random corpus") {
    val rnd = new scala.util.Random(7)
    def mutate(s: String): String = {
      val i = rnd.nextInt(s.length)
      rnd.nextInt(3) match {
        case 0 => s.substring(0, i) + s.substring(i + 1)                  // delete
        case 1 => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar +
          s.substring(i)                                                  // insert
        case _ => s.substring(0, i) + ('a' + rnd.nextInt(26)).toChar +
          s.substring(i + 1)                                              // substitute
      }
    }
    val names = (0 until 120).map(i => f"entity#$i%04d-${rnd.nextInt(100)}%02d")
    val left = names.zipWithIndex.map { case (n, i) => (i.toLong, n) }
    val right = names.zipWithIndex.map { case (n, i) =>
      (1000L + i, if (i % 3 == 0) mutate(n) else n)
    }
    val expected = (for {
      (ia, na) <- left; (ib, nb) <- right
      d = lev(na, nb) if d <= 1
    } yield (ia, ib, d)).toSet
    val got = EntityResolution
      .fuzzyPairs(left.toDF("id", "name"), right.toDF("id", "name"))
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected) // blocking loses nothing, verify adds nothing
  }

  test("oversizedKeys flags a hot shared default name before the join") {
    val df = ((1L to 40L).map(i => (i, "unknown")) ++
      Seq((100L, "alice"), (101L, "bob"))).toDF("id", "name")
    val hot = EntityResolution.oversizedKeys(df, 10).collect()
    assert(hot.nonEmpty && hot.forall(_.getAs[Long]("key_n") == 40L))
    assert(EntityResolution.oversizedKeys(df, 40).isEmpty)
  }

  test("oversizedJoinKeys: product-skew visible only two-sided is flagged") {
    // 'unknown' is rare in the index (3 rows) but on EVERY batch row (50):
    // one-sided audits at minSize 10 miss it on the left; the pair budget
    // 100 < 3·50 = 150 catches the product.
    val index = (Seq((1L, "alice"), (2L, "bob")) ++
      (10L to 12L).map(i => (i, "unknown"))).toDF("id", "name")
    val batch = (100L to 149L).map(i => (i, "unknown")).toDF("id", "name")
    assert(EntityResolution.oversizedKeys(index, 10).isEmpty,
      "one-sided audit must NOT see the product skew (that is the point)")
    val hot = EntityResolution.oversizedJoinKeys(index, batch, 100).collect()
    assert(hot.nonEmpty && hot.forall(_.getAs[Long]("candidate_pairs") == 150L))
    assert(EntityResolution.oversizedJoinKeys(index, batch, 200).isEmpty)
  }

  test("candidate join is an equi-join: no cartesian or nested-loop in the plan") {
    val df = (1L to 50L).map(i => (i, f"name#$i%05d")).toDF("id", "name")
    val plan = EntityResolution.fuzzyPairs(df, df)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("maxDist beyond the depth-1 recall guarantee is rejected") {
    val df = Seq((1L, "x")).toDF("id", "name")
    intercept[IllegalArgumentException] {
      EntityResolution.fuzzyPairs(df, df, maxDist = 2)
    }
  }

  test("streaming linkage: per-micro-batch probe of the static index == batch run") {
    // The production streaming shape: names arrive on a stream and each
    // micro-batch links against the static (persisted) index inside
    // foreachBatch — the per-batch join sidesteps streaming-distinct
    // restrictions and gives exactly batch semantics per arrival set.
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val left = (0 until 60).map(i => (i.toLong, f"org#$i%04d")).toDF("id", "name")
    val index = EntityResolution.nameIndex(left).persist()
    val arrivals = (0 until 60).filter(_ % 4 == 0)
      .map(i => (900L + i, f"org#$i%04d".drop(1))) // dist-1 re-arrivals
    val collected = scala.collection.mutable.Set[(Long, Long, Int)]()
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[(Long, String)]
    val q = input.toDS().toDF("id", "name").writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        collected ++= EntityResolution.fuzzyPairsIncremental(index, batch)
          .as[(Long, Long, Int)].collect()
        ()
      }.start()
    try {
      input.addData(arrivals.take(7): _*)
      q.processAllAvailable()
      input.addData(arrivals.drop(7): _*)
      q.processAllAvailable()
    } finally { q.stop(); index.unpersist(false) }
    val batchRun = EntityResolution
      .fuzzyPairs(left, arrivals.toDF("id", "name"))
      .as[(Long, Long, Int)].collect().toSet
    assert(collected.toSet == batchRun && batchRun.nonEmpty)
  }

  test("incremental probe of a parquet-round-tripped index == direct fuzzyPairs") {
    val rnd = new scala.util.Random(23)
    val left = (0 until 80).map(i =>
      (i.toLong, f"acct#$i%04d-${rnd.nextInt(1000)}%03d")).toDF("id", "name")
    val right = (0 until 80).filter(_ % 3 == 0).map { i =>
      val n = f"acct#$i%04d-xyz"
      (500L + i, if (i % 2 == 0) n.substring(1) else n) // some near, some far
    }.toDF("id", "name")
    val direct = EntityResolution.fuzzyPairs(left, right)
      .as[(Long, Long, Int)].collect().toSet
    val dir = java.nio.file.Files.createTempDirectory("er-index").toString
    EntityResolution.nameIndex(left).write.mode("overwrite").parquet(dir)
    val loaded = spark.read.parquet(dir)
    val viaIndex = EntityResolution.fuzzyPairsIncremental(loaded, right)
      .as[(Long, Long, Int)].collect().toSet
    assert(viaIndex == direct)
  }
}
