package graft

import graft.functions.LangIdModel
import graft.operators.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class LangIdModelSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  /** Independent JVM reference: same md5-nibble hash, same weights. */
  private def refScore(text: String, lang: String): Long = {
    val t = text.toLowerCase
    val w = LangIdModel.Weights(lang)
    (0 until math.max(t.length - 2, 0)).map { i =>
      val g = t.substring(i, i + 3)
      val hex = java.security.MessageDigest.getInstance("MD5")
        .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
      w(Integer.parseInt(hex.take(4), 16) % LangIdModel.B)
    }.sum
  }

  private val udhr = Map(
    "en" -> "All human beings are born free and equal in dignity and rights",
    "de" -> "Alle Menschen sind frei und gleich an Wuerde und Rechten geboren",
    "fr" -> "Tous les etres humains naissent libres et egaux en dignite et en droits",
    "es" -> "Todos los seres humanos nacen libres e iguales en dignidad y derechos")

  test("column pipeline matches the independent JVM reference score") {
    val docs = udhr.toSeq.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }.toDF("doc_id", "lang", "text")
    val got = TextAnalysis.langIdModel(docs)
      .select("labeled_lang", "s_en", "s_de", "s_fr", "s_es")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> Seq(r._2, r._3, r._4, r._5)).toMap
    for ((l, t) <- udhr) {
      val expect = LangIdModel.Langs.map(m => refScore(t, m))
      assert(got(l) == expect, s"score mismatch for sample '$l'")
    }
  }

  test("model separates its training languages (argmax = truth, positive margin)") {
    val docs = udhr.toSeq.zipWithIndex
      .map { case ((l, t), i) => (i.toLong, l, t) }.toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdModel(docs)
      .select("labeled_lang", "predicted_lang").as[(String, String)].collect()
    out.foreach { case (truth, pred) => assert(pred == truth,
      s"UDHR sample labeled $truth predicted $pred") }
  }

  test("short text (under one trigram) predicts 'und'") {
    val docs = Seq((1L, "xx", "ab"), (2L, "xx", "")).toDF("doc_id", "lang", "text")
    val out = TextAnalysis.langIdModel(docs)
      .select("predicted_lang").as[String].collect()
    assert(out.forall(_ == "und"))
    // and the scores are the empty-fold zero, not null
    val s = TextAnalysis.langIdModel(docs).select("s_en").as[Long].collect()
    assert(s.forall(_ == 0L))
  }

  test("tie-break: equal scores fall to Langs priority order") {
    // single repeated char → no trigram weight diversity is not guaranteed;
    // instead force the tie with text whose every trigram is identical:
    // scores then equal w_l[bucket]·n — a tie only if two langs share the
    // bucket weight. Verify the prediction honors priority among the max.
    val docs = Seq((1L, "xx", "aaaa")).toDF("doc_id", "lang", "text")
    val r = TextAnalysis.langIdModel(docs)
      .select("s_en", "s_de", "s_fr", "s_es", "predicted_lang")
      .as[(Long, Long, Long, Long, String)].head()
    val scores = Seq(r._1, r._2, r._3, r._4)
    val best = scores.max
    val expect = LangIdModel.Langs(scores.indexOf(best))
    assert(r._5 == expect)
  }
}
