package graft

import graft.operators.GraphAnn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness (r17): A/B the beam-serving hop shape — current
  * two-broadcast hop (frontier + q) vs a one-broadcast hop where the
  * query vector rides the pool through the cap (first(qv) under the
  * (query_id,node) aggregate — constant per query_id, so identical
  * semantics). Run: sbt "runMain graft.ProfileGraphServe2 /root/testdata/sf0.1"
  */
object ProfileGraphServe2 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[gprof2] $label%-24s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // warm graph artifact
    Queries.queries("sim_graph_build")(spark, dir).count()
    val graph = spark.read.parquet(GraphServeArt.artifactDir(dir))

    import graft.functions.SimFns._
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val n = emb.select(col("vec_id"),
        graft.functions.SimFns.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", graft.functions.SimFns.l2Norm(col("v")))
      .where(col("nrm") > 0)
      .select(col("vec_id"), col("v"), col("nrm"))
    val entry = n.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
      .limit(GraphAnn.NEntries).select(col("vec_id").as("node"))

    def variantA(): Long = { // current shape
      val q = n.where(pmod(col("vec_id"), lit(20)) === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm")).localCheckpoint(false)
      def capped(pool: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("node"))
        pool.repartition(col("query_id"))
          .groupBy(col("query_id"), col("node"))
          .agg(min(col("cosine")).as("cosine"))
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= GraphAnn.Ef)
          .select(col("query_id"), col("node"), col("cosine"))
      }
      def scoreNodes(cand: DataFrame): DataFrame =
        cand.join(n.select(col("vec_id").as("node"), col("v"), col("nrm")), "node")
          .join(broadcast(q), "query_id")
          .select(col("query_id"), col("node"),
            round(cosinePrenormed(dot(col("qv"), col("v")),
              col("qnrm"), col("nrm")), 4).as("cosine"))
      var pool = capped(
        scoreNodes(q.select(col("query_id")).crossJoin(broadcast(entry)))
      ).localCheckpoint(false)
      for (_ <- 1 to GraphAnn.Hops) {
        val expand = graph.select(col("src"), col("dst"))
          .join(broadcast(pool.select(col("query_id"), col("node").as("src"))), "src")
          .select(col("query_id"), col("dst").as("node"))
        pool = capped(pool.unionByName(scoreNodes(expand))).localCheckpoint(false)
      }
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("node"))
      pool.where(col("node") =!= col("query_id"))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
        .count()
    }

    def variantB(): Long = { // qv rides the pool; one broadcast per hop
      val q = n.where(pmod(col("vec_id"), lit(20)) === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm")).localCheckpoint(false)
      def capped(pool: DataFrame): DataFrame = {
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cosine").desc, col("node"))
        pool.repartition(col("query_id"))
          .groupBy(col("query_id"), col("node"))
          .agg(min(col("cosine")).as("cosine"),
            first(col("qv")).as("qv"), first(col("qnrm")).as("qnrm"))
          .withColumn("rnk", row_number().over(w)).where(col("rnk") <= GraphAnn.Ef)
          .select(col("query_id"), col("node"), col("cosine"),
            col("qv"), col("qnrm"))
      }
      def scoreNodes(cand: DataFrame): DataFrame = // cand carries qv/qnrm
        cand.join(n.select(col("vec_id").as("node"), col("v"), col("nrm")), "node")
          .select(col("query_id"), col("node"),
            round(cosinePrenormed(dot(col("qv"), col("v")),
              col("qnrm"), col("nrm")), 4).as("cosine"),
            col("qv"), col("qnrm"))
      var pool = capped(
        scoreNodes(q.crossJoin(broadcast(entry)))
      ).localCheckpoint(false)
      for (_ <- 1 to GraphAnn.Hops) {
        val expand = graph.select(col("src"), col("dst"))
          .join(broadcast(pool.select(col("query_id"), col("qv"), col("qnrm"),
            col("node").as("src"))), "src")
          .select(col("query_id"), col("qv"), col("qnrm"), col("dst").as("node"))
        pool = capped(pool.unionByName(scoreNodes(expand))).localCheckpoint(false)
      }
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("node"))
      pool.where(col("node") =!= col("query_id"))
        .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
        .count()
    }

    var ra = 0L; var rb = 0L
    for (p <- 1 to 3) {
      ra = t(s"A current    p$p")(variantA())
      rb = t(s"B qv-in-pool p$p")(variantB())
    }
    println(s"[gprof2] rows A=$ra B=$rb (must match)")
    spark.stop()
  }
}

/** shared artifact-path helper (mirrors ProfileGraphServe). */
object GraphServeArt {
  def artifactDir(dir: String): String = {
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_artifacts_v1/" + dir.replaceAll("[^A-Za-z0-9.]+", "_"))
    val src = new java.io.File(s"$dir/embeddings.parquet")
    new java.io.File(root,
      s"graph_nsw_k${GraphAnn.K}_r${GraphAnn.Rounds}_skip_${src.length()}_${src.lastModified()}")
      .getAbsolutePath
  }
}
