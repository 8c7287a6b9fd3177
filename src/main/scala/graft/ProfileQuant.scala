package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Dev measurement: recall@10 vs the exact brute ranking for the
  * round-13 quantized tiers — binary (sign-bit Hamming) with and without
  * exact re-rank, int8 scalar quantization, and residual IVF-PQ against
  * the raw-vector IVF-PQ at the SAME (m, ksub, nProbes) budget (the
  * residual claim is precisely "more recall for the same code bytes").
  * The oracles prove determinism; this is the honesty row behind the
  * quality claims in NOTES. `runMain graft.ProfileQuant [sfDir]`. */
object ProfileQuant {
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

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }

    val brute = pairs(Similarity.bruteTopK(e, k = 10, stride = 20))
    def recall(s: Set[(Long, Long)]): Double =
      (s intersect brute).size.toDouble / brute.size

    // --- binary (sign-bit) tier: 16 bytes/vec, popcount pair kernel ---
    val bcodes = Similarity.binqEncode(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    bcodes.count()
    val (bq, tB) = timed(pairs(Similarity.binqTopK(bcodes, queries, k = 10)))
    println(f"[binq] hamming@10 recall=${recall(bq)}%.3f search=$tB%.2fs " +
      "(16 B/vec vs 256 B)")
    for (short <- Seq(50, 200)) {
      val (br, t) = timed(pairs(
        Similarity.binqTopKRefined(bcodes, e, queries, k = 10, short)))
      println(f"[binq] +rerank@$short recall=${recall(br)}%.3f " +
        f"search=$t%.2fs")
    }
    bcodes.unpersist(false)

    // --- int8 scalar quantization: 64 B/vec, same flop count ---
    val scodes = Similarity.sq8Encode(e)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    scodes.count()
    val (sq, tS) = timed(pairs(Similarity.sq8TopK(scodes, queries, k = 10)))
    println(f"[sq8] dequantized-cosine@10 recall=${recall(sq)}%.3f " +
      f"search=$tS%.2fs (64 B/vec + 2 doubles vs 256 B)")
    scodes.unpersist(false)

    // --- residual vs raw IVF-PQ at the SAME budget ---
    val cents = Similarity.kmeansCentroidArrays(e, nCells = 10)
    val rawBooks = Similarity.pqTrain(e, m = 8, ksub = 16)
    val resBooks = Similarity.pqTrainResidual(e, cents, m = 8, ksub = 16)
    val resCodes = Similarity.ivfPqResidualEncode(e, cents, resBooks)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    resCodes.count()
    for (p <- Seq(2, 3, 10)) {
      val (raw, tRaw) = timed(pairs(
        Similarity.ivfPqTopK(e, queries, cents, rawBooks, k = 10, nProbes = p)))
      val (res, tRes) = timed(pairs(
        Similarity.ivfPqResidualTopK(resCodes, queries, cents, resBooks,
          k = 10, nProbes = p)))
      println(f"[ivfpq] nProbes=$p raw recall=${recall(raw)}%.3f " +
        f"($tRaw%.2fs)  residual recall=${recall(res)}%.3f ($tRes%.2fs)")
    }
    resCodes.unpersist(false)

    // --- r14: the CLUSTERED fixture — where residual coding must WIN ---
    // (the embeddings table is near-uniform, so raw ≈ residual there;
    // this is the planted corpus with real cluster structure)
    val fix = Similarity.synthesizeClustered(spark)
    val fq = fix.where(pmod(col("vec_id"), lit(20)) === 0)
    val fBrute = pairs(Similarity.bruteTopK(fix, k = 10, stride = 20))
    def recF(s: Set[(Long, Long)]): Double =
      (s intersect fBrute).size.toDouble / fBrute.size
    val fCents = Similarity.kmeansCentroidArrays(fix, nCells = 8)
    for ((mm, kk) <- Seq((8, 16), (8, 8), (4, 16), (4, 8))) {
      val fRawBooks = Similarity.pqTrain(fix, m = mm, ksub = kk)
      val fResBooks = Similarity.pqTrainResidual(fix, fCents, m = mm, ksub = kk)
      val fResCodes = Similarity.ivfPqResidualEncode(fix, fCents, fResBooks)
      val raw = pairs(Similarity.ivfPqTopK(fix, fq, fCents, fRawBooks,
        k = 10, nProbes = 2))
      val res = pairs(Similarity.ivfPqResidualTopK(fResCodes, fq, fCents,
        fResBooks, k = 10, nProbes = 2))
      println(f"[fixture] m=$mm ksub=$kk raw recall=${recF(raw)}%.3f " +
        f"residual recall=${recF(res)}%.3f (8 planted clusters, nProbes=2)")
    }
    // --- r14: OPQ rotation on the ANISOTROPIC fixture ---
    // identity-split PQ vs Hadamard-rotated PQ at the same budget
    // the corpus is H·z — an axis-aligned anisotropic latent z SMEARED
    // across all dims by the (self-inverse) Hadamard rotation; plain PQ
    // sees correlated subspaces, the OPQ rotation recovers z exactly
    val lat = Similarity.synthesizeAniso(spark)
    val corpus = Similarity.rotateEmbeddings(lat, Similarity.hadamard16)
    val cQ = corpus.where(pmod(col("vec_id"), lit(20)) === 0)
    val cBrute = pairs(Similarity.bruteTopK(corpus, k = 10, stride = 20))
    def recA(s: Set[(Long, Long)]): Double =
      (s intersect cBrute).size.toDouble / cBrute.size
    val unrot = Similarity.rotateEmbeddings(corpus, Similarity.hadamard16)
    val uQ = unrot.where(pmod(col("vec_id"), lit(20)) === 0)
    for ((mm, kk) <- Seq((8, 8), (8, 16))) {
      val pqB = Similarity.pqTrain(corpus, m = mm, ksub = kk)
      val plain = pairs(Similarity.pqTopKAdc(
        Similarity.pqEncode(corpus, pqB), cQ, pqB, k = 10))
      val opqB = Similarity.pqTrain(unrot, m = mm, ksub = kk)
      val opq = pairs(Similarity.pqTopKAdc(
        Similarity.pqEncode(unrot, opqB), uQ, opqB, k = 10))
      println(f"[opq] m=$mm ksub=$kk plain recall=${recA(plain)}%.3f " +
        f"OPQ-rotated recall=${recA(opq)}%.3f (smeared-latent corpus)")
    }
    // TRAINED rotation on the REAL embeddings table — the sim_opq_topk
    // operating point: on this near-uniform corpus the covariance is
    // ~isotropic, so the honest expectation is recall ≈ plain PQ
    {
      val rE = Similarity.opqTrainRotation(e, m = 8)
      val rotE = Similarity.rotateEmbeddings(e, rE)
      val rq = rotE.where(pmod(col("vec_id"), lit(20)) === 0)
      val plainB = Similarity.pqTrain(e, m = 8, ksub = 16)
      val plainR = recall(pairs(Similarity.pqTopKAdc(
        Similarity.pqEncode(e, plainB), queries, plainB, k = 10)))
      val opqB = Similarity.pqTrain(rotE, m = 8, ksub = 16)
      val opqR = recall(pairs(Similarity.pqTopKAdc(
        Similarity.pqEncode(rotE, opqB), rq, opqB, k = 10)))
      println(f"[opq] EMBEDDINGS table m=8 ksub=16: plain recall=$plainR%.3f " +
        f"trained-OPQ recall=$opqR%.3f (near-uniform corpus)")
    }

    // TRAINED rotation (PCA + balanced allocation) — must rediscover the
    // latent basis without being told it (the fixed-H row above knows it)
    {
      val rT = Similarity.opqTrainRotation(corpus, m = 8)
      val rotT = Similarity.rotateEmbeddings(corpus, rT)
      val tQ = rotT.where(pmod(col("vec_id"), lit(20)) === 0)
      val books = Similarity.pqTrain(rotT, m = 8, ksub = 16)
      val trained = pairs(Similarity.pqTopKAdc(
        Similarity.pqEncode(rotT, books), tQ, books, k = 10))
      println(f"[opq] m=8 ksub=16 TRAINED rotation recall=${recA(trained)}%.3f " +
        "(PCA/Jacobi + balanced allocation, latent basis not given)")
    }

    // --- r15: the COMPOSED production layout (OPQ ∘ residual IVF-PQ) ---
    // the full FAISS chain vs its two halves at equal code budget, on
    // the smeared-latent corpus (the honest case) AND the real table
    {
      val rT = Similarity.opqTrainRotation(corpus, m = 8)
      val rotT = Similarity.rotateEmbeddings(corpus, rT)
      for (nc <- Seq(8)) {
        val cU = Similarity.kmeansCentroidArrays(corpus, nCells = nc)
        val bU = Similarity.pqTrainResidual(corpus, cU, m = 8, ksub = 16)
        val resid = pairs(Similarity.ivfPqResidualTopKWide(
          Similarity.pqCodesWide(
            Similarity.ivfPqResidualEncode(corpus, cU, bU), Seq("cell")),
          cQ, cU, bU, k = 10, nProbes = 2))
        val cR = Similarity.kmeansCentroidArrays(rotT, nCells = nc)
        val bR = Similarity.pqTrainResidual(rotT, cR, m = 8, ksub = 16)
        val composed = pairs(Similarity.opqIvfPqTopKWide(
          Similarity.opqIvfPqEncodeWide(corpus, rT, cR, bR),
          cQ, rT, cR, bR, k = 10, nProbes = 2))
        println(f"[composed] aniso nCells=$nc residual=${recA(resid)}%.3f " +
          f"opq-composed=${recA(composed)}%.3f (m=8 ksub=16 nProbes=2)")
      }
      // the real table at the sim_opq_ivfpq_topk operating point
      val rE = Similarity.opqTrainRotation(e, m = 8)
      val rotE = Similarity.rotateEmbeddings(e, rE)
      val cE = Similarity.kmeansCentroidArrays(rotE, nCells = 10)
      val bE = Similarity.pqTrainResidual(rotE, cE, m = 8, ksub = 16)
      val (comp, tC) = timed(pairs(Similarity.opqIvfPqTopKWide(
        Similarity.opqIvfPqEncodeWide(e, rE, cE, bE),
        e.where(pmod(col("vec_id"), lit(20)) === 0), rE, cE, bE,
        k = 10, nProbes = 3)))
      println(f"[composed] EMBEDDINGS table recall=${recall(comp)}%.3f " +
        f"search=$tC%.2fs (OPQ8,IVF10,PQ8 nProbes=3 — scan ~3/10 of codes)")
    }
    spark.stop()
  }
}
