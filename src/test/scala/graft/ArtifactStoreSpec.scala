package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The write-once parquet artifact store's retention + concurrency
  * contract (VERDICT r15 #5/#8):
  *
  *  - a successful build prunes every OTHER fingerprint of the SAME
  *    artifact name, and only those — the exact `name_digits_digits`
  *    match can never clip a sibling whose name extends this one;
  *  - the prune runs inside the new fingerprint's build lock and
  *    excludes the directory just built, so in-JVM concurrent readers
  *    of the CURRENT fingerprint never lose files mid-scan;
  *  - a reader can only hold a SUPERSEDED fingerprint path if the
  *    source data mutated while that reader was mid-flight — excluded
  *    by the store's documented single-writer assumption (testdata is
  *    immutable while a query JVM runs; regeneration happens between
  *    rounds), which this spec pins by construction: the fingerprint
  *    flip below is an explicit out-of-band mtime bump;
  *  - the debug catalog listing ([[QueriesSim.artifactCatalog]], now
  *    spec-only — the registry serves the oracled checked face) parses
  *    every stored dir into (name, fingerprint) and reports real
  *    file/byte totals.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Exposes the protected store + catalog members for the spec. */
  private object Store extends QueriesMultimodal {
    def art(dir: String, name: String)(b: => DataFrame): DataFrame =
      parquetArtifact(spark, dir, name, "mini")(b)
    def path(dir: String, name: String): String = artifactPath(dir, name)
    def catalog(dir: String): DataFrame = artifactCatalog(spark, dir)
    def catalogChecked(dir: String): DataFrame =
      artifactCatalogChecked(spark, dir)
  }

  /** A throwaway sfDir with a `mini.parquet` fingerprint source. */
  private def freshDir(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft-artspec").toFile
    (1 to 5).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(new java.io.File(d, "mini.parquet").toString)
    d.getAbsolutePath
  }

  private def fingerprintDirs(dir: String, name: String): Seq[String] = {
    val root = new java.io.File(Store.path(dir, "x")).getParentFile
    val pat = java.util.regex.Pattern.quote(name) + "_\\d+_\\d+"
    Option(root.listFiles()).toSeq.flatten
      .filter(f => f.isDirectory && f.getName.matches(pat))
      .map(_.getName).sorted
  }

  test("retention prunes only superseded fingerprints of the same name; " +
      "extended-name siblings and the fresh build survive; concurrent " +
      "readers of the current fingerprint never error") {
    val dir = freshDir()
    val src = new java.io.File(s"$dir/mini.parquet")

    // fingerprint A builds of the artifact and an extended-name sibling
    assert(Store.art(dir, "ret_demo")(spark.range(7).toDF("n")).count() == 7)
    assert(Store.art(dir, "ret_demo_wide")(spark.range(3).toDF("n")).count() == 3)
    val aDirs = fingerprintDirs(dir, "ret_demo")
    val aSib = fingerprintDirs(dir, "ret_demo_wide")
    assert(aDirs.size == 1 && aSib.size == 1)

    // out-of-band source regeneration: mtime bump → fingerprint B.
    // (The single-writer assumption the store documents: this never
    // happens while a reader of fingerprint A is mid-flight.)
    assert(src.setLastModified(src.lastModified() + 10000))

    // fingerprint B build races 8 concurrent readers of the SAME
    // artifact+fingerprint: the lock serializes the one build, the
    // prune excludes the dir just built, so every reader sees a
    // complete artifact with the right rows.
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val reads = (1 to 8).map(_ => Future {
      Store.art(dir, "ret_demo")(spark.range(7).toDF("n")).count()
    })
    assert(Await.result(Future.sequence(reads), 120.seconds).forall(_ == 7L))

    val bDirs = fingerprintDirs(dir, "ret_demo")
    assert(bDirs.size == 1 && bDirs != aDirs,
      s"fingerprint A must be pruned, B kept: was $aDirs, now $bDirs")
    assert(new java.io.File(new java.io.File(
      new java.io.File(Store.path(dir, "x")).getParent, bDirs.head),
      "_SUCCESS").isFile, "the surviving dir is the complete fresh build")
    // the sibling's (now-stale) fingerprint dir was NOT clipped by the
    // ret_demo prune — only a ret_demo_wide build may prune it
    assert(fingerprintDirs(dir, "ret_demo_wide") == aSib,
      "extended-name sibling must survive the base-name prune")
  }

  test("debug catalog lists stored artifacts with parsed name/fingerprint " +
      "and real file/byte totals; checked face matches its oracle shape") {
    val dir = "/root/testdata/sf0.001"
    val checked = Store.catalogChecked(dir)
      .orderBy("artifact")
      .as[(String, Boolean, Long)].collect().toSeq
    val n = Tables.embeddings(spark, dir).count()
    assert(checked == Seq(
      ("pq_codes_all_m8_k16", true, 8 * n),
      ("pq_codes_all_wide_m8_k16", true, n)),
      s"checked catalog face must pin fingerprint rule + cardinality: $checked")

    val cat = Store.catalog(dir)
      .as[(String, String, Int, Long)].collect()
    val byName = cat.map(r => r._1 -> r).toMap
    for (nm <- Seq("pq_codes_all_m8_k16", "pq_codes_all_wide_m8_k16")) {
      val row = byName.getOrElse(nm, fail(s"catalog missing $nm: ${cat.toSeq}"))
      assert(row._2.matches("\\d+_\\d+"), s"fingerprint must parse: $row")
      assert(row._3 > 0 && row._4 > 0L, s"real file/byte totals: $row")
    }
  }
}
