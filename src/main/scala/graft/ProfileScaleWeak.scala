package graft

import graft.operators.{Multimodal, VariantOps}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage 10×-scale adjudication for the two bench queries whose warm
  * wall ratio at 10× data exceeds the board's typical 1–2× (VERDICT r10
  * weak items): dedup_multimodal (recorded 6.6×) and x_variant_shred
  * (recorded 5.8×). Prints warm per-stage timings at SPARK_GRAFT_SF_DIR
  * so each ratio can be attributed stage by stage — encode vs
  * decode+signature vs candidate+verify for the image near-dup, payload
  * synthesis vs parse+shred for the variant tier. Run once at sf0.1 and
  * once at /tmp/sf1 (dev/gen_scale.py), compare per-stage ratios; the
  * findings live in NOTES.md (round 11).
  *
  * The cache is CLEARED before every rep: nearDupImages persists its
  * signature frame internally, so without the clear every rep after the
  * first would time only the candidate stage and the full-query number
  * would be meaningless. min-of-3 inside one JVM = the comparable warm
  * number (same convention as BenchSeq). */
object ProfileScaleWeak {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(f: => Long): Unit = {
      val ts = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val all = ts.map(t => f"${t._1}%.2f").mkString(",")
      println(f"[scale] $label: ${ts.map(_._1).min}%.2f s " +
        f"(rows=${ts.head._2}; reps=$all)")
    }

    println(s"[scale] sfDir=$sfDir")
    val docs = Tables.documents(spark, sfDir)
    def imgs = Multimodal.synthesizeImages(spark, docs)
      .repartition(col("asset_id"))
    // encode only (synthesize + PNG write; the fixture's cost)
    time("mm_encode") {
      imgs.toDF().agg(sum(length(col("png")))).collect()(0).getLong(0)
    }
    // encode + decode + block signature (the linear per-asset stage)
    time("mm_signature")(Multimodal.signatureIndex(spark, imgs).count())
    // the whole operator (adds band keys, capped self-join, exact verify)
    time("mm_full")(Multimodal.nearDupImages(spark, imgs).count())

    val ev = Tables.events(spark, sfDir)
    time("var_rows")(ev.count())
    // payload synthesis only (the fixture's cost — prod reads stored text)
    time("var_synth") {
      VariantOps.eventPayload(ev)
        .agg(sum(length(col("payload")))).collect()(0).getLong(0)
    }
    // synthesis + parse_json + 6 variant_get probes (the operator)
    time("var_shred_scan") {
      VariantOps.shred(VariantOps.eventPayload(ev))
        .agg(sum(col("uid"))).collect()(0).getLong(0)
    }
    // the registered bench query (adds filter + hash agg)
    time("var_full")(Queries.queries("x_variant_shred")(spark, sfDir).count())
    spark.stop()
  }
}
