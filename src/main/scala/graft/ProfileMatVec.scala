package graft

import graft.operators.Similarity
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (r15): the OPQ pretransform cost — native `mat_vec_d`
  * rotation vs the transform/aggregate/zip_with HOF chain it replaced,
  * 500k rows × dim 64 (the real embeddings shape), warm min-of-3.
  * The HOF chain is CodegenFallback and allocates a zip_with
  * intermediate per output element (dim+1 allocations/row); the kernel
  * is one primitive loop in whole-stage codegen. */
object ProfileMatVec {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", 16)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dim = 64
    val r = Seq.tabulate(dim, dim)((i, j) =>
      math.sin(i * 7 + j * 3 + 1) / 8.0).map(_.toArray)
    val vecs = spark.range(500000).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), d =>
        ((col("id") * 13 + d * 7) % 97).cast("double") / lit(97.0))
        .as("embedding"))
      .persist()
    vecs.count()

    def hof(): Long = {
      val rCol = array(r.map(row => array(row.map(lit): _*)): _*)
      vecs.select(transform(sequence(lit(0), lit(dim - 1)), i =>
          aggregate(zip_with(element_at(rCol, i + 1),
            transform(col("embedding"), x => x.cast("double")),
            (a, b) => a * b), lit(0.0), (acc, x) => acc + x)).as("e"))
        .select(sum(element_at(col("e"), 1))).head(); 0L
    }
    def native(): Long = {
      vecs.select(graft.functions.SimFns.matVec(r, col("embedding")).as("e"))
        .select(sum(element_at(col("e"), 1))).head(); 0L
    }
    def time(tag: String)(f: => Unit): Unit = {
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[matvec] $tag min=${times.min}%.2f s reps=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    time("hof")(hof())
    time("native")(native())
    // residual subtraction: zip_with HOF vs native vec_sub_d
    val cvLit = array(Seq.tabulate(dim)(d => lit(d / 64.0)): _*)
    def subHof(): Unit = {
      vecs.select(zip_with(col("embedding"), cvLit, (a, b) => a - b).as("e"))
        .select(sum(element_at(col("e"), 1))).head(); ()
    }
    def subNative(): Unit = {
      vecs.select(graft.functions.SimFns.vecSub(col("embedding"), cvLit).as("e"))
        .select(sum(element_at(col("e"), 1))).head(); ()
    }
    time("sub_hof")(subHof())
    time("sub_native")(subNative())
    // float->double promotion: transform(cast) HOF vs native array cast
    val fvecs = vecs.select(transform(col("embedding"),
      x => x.cast("float")).as("f")).persist()
    fvecs.count()
    def castHof(): Unit = {
      fvecs.select(transform(col("f"), x => x.cast("double")).as("e"))
        .select(sum(element_at(col("e"), 1))).head(); ()
    }
    def castNative(): Unit = {
      fvecs.select(col("f").cast("array<double>").as("e"))
        .select(sum(element_at(col("e"), 1))).head(); ()
    }
    time("cast_hof")(castHof())
    time("cast_native")(castNative())
    // binq sign packing (the Hamming-tier encode) — current HOF chain
    def binqHof(): Unit = {
      graft.operators.Similarity.binqEncode(
          vecs.select(col("vec_id"), col("embedding")))
        .select(sum(element_at(col("bw"), 1))).head(); ()
    }
    time("binq_hof")(binqHof()) // now the NATIVE path (name kept for history)
    // PQ encode: declarative fan-out (m·ksub rows + exchange) vs fused
    val books = Seq.tabulate(8, 16)((s, c) =>
      Array.tabulate(8)(j => math.sin(s * 31 + c * 7 + j * 3) / 4.0))
      .map(_.map(x => x).toSeq)
    def encDeclarative(): Unit = {
      graft.operators.Similarity.pqCodesWide(
          graft.operators.Similarity.pqEncode(
            vecs.select(col("vec_id"), col("embedding")), books))
        .select(sum(element_at(col("codes"), 1))).head(); ()
    }
    def encFused(): Unit = {
      graft.operators.Similarity.pqEncodeWideDirect(
          vecs.select(col("vec_id"), col("embedding")), books)
        .select(sum(element_at(col("codes"), 1))).head(); ()
    }
    time("pqenc_declarative")(encDeclarative())
    time("pqenc_fused")(encFused())
    spark.stop()
  }
}
