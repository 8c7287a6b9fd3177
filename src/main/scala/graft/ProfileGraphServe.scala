package graft

import graft.operators.GraphAnn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Dev harness (r16 optimization): per-stage timing of the graph-ANN
  * beam serving path — where do sim_graph_topk's seconds go? Replays
  * beamCore's stages one checkpoint at a time and times each, then
  * prints hop-1's pre-checkpoint plan so the join strategies are
  * visible (the registered query's explain only shows the final rank
  * window over the checkpointed pool). Run:
  *   sbt "runMain graft.ProfileGraphServe /root/testdata/sf0.1"
  */
object ProfileGraphServe {
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
      println(f"[gprof] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    // the persisted artifact, as the query reads it
    val graph = t("graph artifact load+count") {
      val g = Queries.queries("sim_graph_build")(spark, dir)
      g.count()
      spark.read.parquet(artifactDir(dir))
    }

    for (pass_ <- 1 to 2) {
      println(s"[gprof] ---- pass $pass_ ----")
      // serving-side raw scan (r16: no fan-out exchange under a broadcast)
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = t("prep n") {
        val x = emb.select(col("vec_id"),
            graft.functions.SimFns.toDouble(col("embedding")).as("v"))
          .withColumn("nrm", graft.functions.SimFns.l2Norm(col("v")))
          .where(col("nrm") > 0)
          .select(col("vec_id"), col("v"), col("nrm"))
        x.write.format("noop").mode("overwrite").save(); x
      }
      val q = t("q ckpt") { n.where(pmod(col("vec_id"), lit(20)) === 0)
        .select(col("vec_id").as("query_id"), col("v").as("qv"),
          col("nrm").as("qnrm")).localCheckpoint() }

      import graft.functions.SimFns._
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
      val entry = n.orderBy(md5(col("vec_id").cast("string")), col("vec_id"))
        .limit(GraphAnn.NEntries).select(col("vec_id").as("node"))
      var pool = t("pool0 cap+ckpt") { capped(
        scoreNodes(q.select(col("query_id")).crossJoin(broadcast(entry)))
      ).localCheckpoint() }
      var hopPlan: Option[DataFrame] = None
      for (h <- 1 to GraphAnn.Hops) {
        val expand = graph.select(col("src"), col("dst"))
          .join(broadcast(pool.select(col("query_id"), col("node").as("src"))), "src")
          .select(col("query_id"), col("dst").as("node"))
        val next = capped(pool.unionByName(scoreNodes(expand)))
        if (h == 1 && pass_ == 2) hopPlan = Some(next)
        pool = t(s"hop $h cap+ckpt") { next.localCheckpoint() }
      }
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cosine").desc, col("node"))
      t("final rank") {
        pool.where(col("node") =!= col("query_id"))
          .withColumn("rank", row_number().over(w)).where(col("rank") <= 10)
          .write.format("noop").mode("overwrite").save()
      }
      if (pass_ == 2) hopPlan.foreach(_.explain("formatted"))
    }
    spark.stop()
  }

  private def artifactDir(dir: String): String = {
    val root = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      "graft_artifacts_v1/" + dir.replaceAll("[^A-Za-z0-9.]+", "_"))
    val src = new java.io.File(s"$dir/embeddings.parquet")
    new java.io.File(root,
      s"graph_nsw_k${GraphAnn.K}_r${GraphAnn.Rounds}_skip_${src.length()}_${src.lastModified()}")
      .getAbsolutePath
  }
}
