package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev measurement: PQ/ADC recall@10 vs the exact brute ranking on the
  * embeddings table, plus warm timings — the honesty row behind the
  * sim_pq_* NOTES claims (the oracle proves determinism, not quality).
  * `runMain graft.ProfilePq [sfDir]`. */
object ProfilePq {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.embeddings(spark, sfDir)
    val queries = e.where(pmod(col("vec_id"), lit(20)) === 0)

    def pairs(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select(col("query_id").cast("long"), col("neighbor_id").cast("long"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val brute = pairs(Similarity.bruteTopK(e, k = 10, stride = 20))
    for ((m, ksub) <- Seq((8, 16), (8, 64), (16, 16))) {
      val t0 = System.nanoTime()
      val books = Similarity.pqTrain(e, m = m, ksub = ksub)
      val tTrain = (System.nanoTime() - t0) / 1e9
      val codes = Similarity.pqEncode(e, books)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      codes.count()
      val t1 = System.nanoTime()
      val adc = pairs(Similarity.pqTopKAdc(codes, queries, books, k = 10))
      val tSearch = (System.nanoTime() - t1) / 1e9
      val recall = (adc intersect brute).size.toDouble / brute.size
      val t2 = System.nanoTime()
      val refined = pairs(Similarity.pqTopKRefined(codes, e, queries,
        books, k = 10, shortlist = 200))
      val tRefine = (System.nanoTime() - t2) / 1e9
      val recallR = (refined intersect brute).size.toDouble / brute.size
      println(f"[pq] m=$m ksub=$ksub recall@10=$recall%.3f " +
        f"refined@200=$recallR%.3f train=$tTrain%.2fs " +
        f"search=$tSearch%.2fs refine=$tRefine%.2fs " +
        f"(code table: ${m} ints/vec vs 64 floats)")
      codes.unpersist(false)
    }

    // r14 (VERDICT r13 #1): the persisted-codes artifact vs the inline
    // corpus re-encode for the WIDE flat-ADC search — what the artifact
    // actually buys per query batch at this SF. Same books, same plan
    // below the code table; the only difference is whether the m-int
    // rows are read from parquet or re-derived from the raw vectors.
    {
      val books = Similarity.pqTrain(e, m = 8, ksub = 16)
      def timeIt(f: => Long): Double = {
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val inline =
        (1 to 3).map(_ => timeIt(Similarity.pqTopKAdcWide(
          Similarity.pqCodesWide(Similarity.pqEncode(e, books)),
          queries, books, k = 10).count())).min
      val artDir = java.nio.file.Files.createTempDirectory("pq_wide_art")
        .toString
      Similarity.pqCodesWide(Similarity.pqEncode(e, books))
        .write.mode("overwrite").parquet(artDir)
      val stored = spark.read.parquet(artDir)
      val art =
        (1 to 3).map(_ => timeIt(Similarity.pqTopKAdcWide(
          stored, queries, books, k = 10).count())).min
      println(f"[pq] wide-ADC search, inline re-encode=$inline%.2fs vs " +
        f"persisted codes=$art%.2fs (min of 3, m=8 ksub=16)")
    }
    spark.stop()
  }
}
