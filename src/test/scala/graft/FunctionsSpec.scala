package graft

import graft.functions.{OddsFns, TextFns, TimeFns}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class OddsFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("ladder shape: 291 values, −10000…−101 ∪ +100…+10000, no −100, sorted") {
    val l = OddsFns.Ladder
    assert(l.size == 291)
    assert(l.min == -10000 && l.max == 10000)
    assert(!l.contains(-100) && l.contains(100) && l.contains(-101))
    assert(l == l.sorted)
    assert(!l.exists(v => v > -100 && v < 100))
  }

  test("normalizeOdds flips −100 to +100 and nothing else") {
    val in = Seq(-100, 100, -101, 150, -10000, 10000).toDF("odds")
    val out = in.select(OddsFns.normalizeOdds($"odds").as("n")).as[Int].collect()
    assert(out.toSeq == Seq(100, 100, -101, 150, -10000, 10000))
  }

  test("ladderAt covers every index and always lands in the ladder") {
    val out = spark.range(291)
      .select(OddsFns.ladderAt(col("id")).as("v")).as[Int].collect()
    assert(out.toSet == OddsFns.Ladder.toSet)
  }

  test("american↔decimal round-trips on ladder values") {
    val out = OddsFns.Ladder.toDF("odds")
      .select($"odds", OddsFns.decimalToAmerican(OddsFns.americanToDecimal($"odds")).as("rt"))
      .as[(Int, Int)].collect()
    assert(out.forall { case (odds, rt) => rt == odds })
  }

  test("snapToLadder returns a ladder member, never −100 (property)") {
    val samples = Seq(-20000, -150, -100, -99, 0, 99, 100, 123, 9999, 20000)
    val out = samples.toDF("x").select(OddsFns.snapToLadder($"x").as("v")).as[Int].collect()
    out.foreach(v => assert(OddsFns.Ladder.contains(v) && v != -100))
    // exact members snap to themselves
    val members = OddsFns.Ladder.toDF("x")
      .select($"x", OddsFns.snapToLadder($"x").as("v")).as[(Int, Int)].collect()
    members.foreach { case (x, v) => assert(v == x || x == -100) }
  }
}

class TimeFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("epoch-nanos → micros is exact above double precision (C3)") {
    val ns = 1704213032756367999L // low digits would be lost via double
    val out = Seq(ns).toDF("ns")
      .select(TimeFns.nanosToMicros($"ns").as("us")).as[Long].head()
    assert(out == 1704213032756367L)
  }

  test("ISO parse + NY conversion renders EST/EDT correctly (C1+C2)") {
    val out = Seq("2024-01-01T12:00:00Z", "2024-07-01T12:00:00Z").toDF("s")
      .select(TimeFns.render(TimeFns.toNewYork(TimeFns.parseIso($"s"))).as("r"))
      .as[String].collect()
    assert(out.toSeq == Seq("2024-01-01 07:00:00", "2024-07-01 08:00:00")) // EST −5 / EDT −4
  }

  test("nanos → US/Eastern matches the reference's updated_at path (C3)") {
    val ns = 1704110400L * 1000000000L // 2024-01-01T12:00:00Z
    val out = Seq(ns).toDF("ns")
      .select(TimeFns.render(TimeFns.nanosToEastern($"ns")).as("r")).as[String].head()
    assert(out == "2024-01-01 07:00:00")
  }
}

class TextFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  test("tokens: blank → empty, whitespace runs collapse") {
    val out = Seq("", "   ", "a  b\tc", "The Fast FOX").toDF("text")
      .select(size(TextFns.tokens($"text")).as("n")).as[Int].collect()
    assert(out.toSeq == Seq(0, 0, 3, 3))
  }

  test("shingles: 3-grams, short docs collapse to whole text") {
    val out = Seq("a b c d e", "a b").toDF("text")
      .select(TextFns.shingles(TextFns.tokens($"text"), 3).as("sh"))
      .as[Seq[String]].collect()
    assert(out(0) == Seq("a b c", "b c d", "c d e"))
    assert(out(1) == Seq("a b"))
  }

  test("jaccard: identical=1, disjoint=0") {
    val df = Seq(("a b c d e", "a b c d e"), ("a b c", "x y z")).toDF("t1", "t2")
    val out = df.select(TextFns.jaccard(
      TextFns.shingles(TextFns.tokens($"t1"), 3),
      TextFns.shingles(TextFns.tokens($"t2"), 3)).as("j")).as[Double].collect()
    assert(out(0) == 1.0 && out(1) == 0.0)
  }

  test("simhash16: in [0,65536), equal docs equal, stable") {
    val out = Seq("spark catalyst codegen", "spark catalyst codegen", "completely different words here")
      .toDF("text")
      .select(TextFns.simhash16(transform(TextFns.tokens($"text"), t => TextFns.hash16(t))).as("h"))
      .as[Int].collect()
    assert(out(0) == out(1))
    assert(out.forall(h => h >= 0 && h < 65536))
  }

  test("langId picks the language whose markers dominate") {
    val out = Seq(
      "the cat sat on the mat and the dog is here",
      "der hund und die katze ist ein tier",
      "le chat et la souris les amis",
      "el perro y los gatos las casas con",
      "qwerty zxcvb").toDF("text")
      .select(TextFns.langId($"text").as("l")).as[String].collect()
    assert(out.toSeq == Seq("en", "de", "fr", "es", "und"))
  }

  test("quality score stays in [0,1]") {
    val out = Seq("", "short", ("word " * 200) + "!!!").toDF("text")
      .select(TextFns.qualityScore($"text").as("q")).as[Double].collect()
    assert(out.forall(q => q >= 0.0 && q <= 1.0))
  }
}

class SimFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import graft.functions.SimFns
  import spark.implicits._

  test("native dot matches a JVM-side sequential fold exactly") {
    val a = Array(0.1, -2.5, 3.75, 0.0, 1e-9)
    val b = Array(4.0, 0.5, -1.25, 9.0, 2e9)
    val expected = a.zip(b).foldLeft(0.0) { case (acc, (x, y)) => acc + x * y }
    val got = Seq((a.toSeq, b.toSeq)).toDF("a", "b")
      .select(SimFns.dot($"a", $"b").as("d")).as[Double].head()
    assert(got == expected) // bit-exact: same accumulation order
  }

  test("dot_d fold parity: null element or length mismatch gives NULL, not a partial sum") {
    val df = Seq((
      Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](2.0, 3.0),
      Seq[java.lang.Double](1.0, 2.0, 3.0), Seq[java.lang.Double](1.0, 2.0)))
      .toDF("withNull", "clean", "len3", "len2")
    val row = df.select(
      SimFns.dot($"withNull", $"clean").as("nullElem"),
      SimFns.dot($"len3", $"len2").as("mismatch"),
      SimFns.dot($"len2", $"len2").as("ok")).head()
    assert(row.isNullAt(0), "null element must null the whole dot")
    assert(row.isNullAt(1), "length mismatch must null the whole dot")
    assert(row.getDouble(2) == 5.0)
  }

  test("dot_d rejects non-double arrays at analysis time, not silently") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(SimFns.dot($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("array<double>"), ex.getMessage)
  }

  private def sumAbsDiff(a: org.apache.spark.sql.Column,
      b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.SumAbsDiffL(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(a),
      org.apache.spark.sql.graftbridge.GraftBridge.expression(b)))

  test("sum_abs_diff_l equals the HOF fold it replaced, incl. null semantics") {
    val rnd = new scala.util.Random(9)
    val rows = (1 to 50).map(_ => (
      Seq.fill(16)(rnd.nextInt(256).toLong), Seq.fill(16)(rnd.nextInt(256).toLong)))
    val df = rows.toDF("ba", "bb")
    val pairs = df.select(
      sumAbsDiff($"ba", $"bb").as("native"),
      expr("aggregate(zip_with(ba, bb, (x, y) -> abs(x - y)), 0L, (acc, v) -> acc + v)")
        .as("hof")).as[(Long, Long)].collect()
    assert(pairs.forall { case (n, h) => n == h })
    val edge = Seq((
      Seq[java.lang.Long](1L, null), Seq[java.lang.Long](2L, 3L),
      Seq[java.lang.Long](1L, 2L, 3L), Seq[java.lang.Long](1L, 2L)))
      .toDF("withNull", "clean", "len3", "len2")
    val row = edge.select(
      sumAbsDiff($"withNull", $"clean").as("nullElem"),
      sumAbsDiff($"len3", $"len2").as("mismatch"),
      sumAbsDiff($"len2", $"len2").as("ok")).head()
    assert(row.isNullAt(0) && row.isNullAt(1) && row.getLong(2) == 0L)
    // int arrays must be rejected at analysis, not read as garbage longs
    val bad = Seq((Array(1, 2), Array(3, 4))).toDF("a", "b")
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      bad.select(sumAbsDiff($"a", $"b")).collect()
    }
    assert(ex.getMessage.contains("array<bigint>"), ex.getMessage)
  }
}

class NfcNormalizeSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def nfc(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.NfcNormalize(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(c)))

  test("nfc_normalize: UAX#15 canonical compose, pinned cases (whole-stage codegen path)") {
    // (input, expected) — decomposed sequences compose; composed + ASCII
    // pass through; multi-mark keeps the non-composable mark; Hangul Jamo
    // LV-composes. Expected strings double as the cross-engine contract
    // (DuckDB's utf8proc nfc_normalize yields the same codepoints).
    val cases = Seq(
      ("e\u0301", "\u00e9"),
      ("caf" + "e\u0301", "caf\u00e9"),
      ("\u00c5", "\u00c5"),
      ("A\u030a", "\u00c5"),
      ("A\u0308\u0301", "\u00c4\u0301"),
      ("\u1e0b\u0323", "\u1e0d\u0307"),
      ("plain ascii", "plain ascii"),
      ("\uac00", "\uac00"),
      ("\u1100\u1161", "\uac00"))
    val got = cases.map(_._1).zipWithIndex.map { case (s, i) => (i, s) }
      .toDF("i", "s").select($"i", nfc($"s").as("n"))
      .orderBy("i").as[(Int, String)].collect().map(_._2)
    cases.map(_._2).zip(got).foreach { case (want, have) =>
      assert(have == want,
        s"want ${want.map(c => f"U+${c.toInt}%04X").mkString(" ")} " +
          s"got ${have.map(c => f"U+${c.toInt}%04X").mkString(" ")}")
    }
    // and the JVM reference agrees (the interpreted-eval twin)
    cases.foreach { case (in, want) =>
      assert(java.text.Normalizer.normalize(in, java.text.Normalizer.Form.NFC) == want)
      assert(graft.plans.NfcNormalize(
        org.apache.spark.sql.catalyst.expressions.Literal(in)).eval() ==
        org.apache.spark.unsafe.types.UTF8String.fromString(want))
    }
  }

  test("nfc_normalize: null in, null out; non-string rejected at analysis") {
    val row = Seq(Tuple1[String](null)).toDF("s").select(nfc($"s")).head()
    assert(row.isNullAt(0))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("x").select(nfc($"x")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"), ex.getMessage)
  }
}

class CompressFnsSpec extends AnyFunSuite {
  private val spark = TestSpark.spark
  import spark.implicits._

  private def dl(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graftbridge.GraftBridge.column(graft.plans.DeflateLen(
      org.apache.spark.sql.graftbridge.GraftBridge.expression(c)))

  test("deflate_len: repetition << prose << hex noise; deterministic; bounded") {
    val repetitive = "spark catalyst " * 140              // ~2100 bytes, low entropy
    val prose = ("the quick brown fox jumps over the lazy dog while catalyst " +
      "optimizes declarative plans into pruned scans and broadcast joins ") * 18
    val noise = (1 to 66).map(i => java.security.MessageDigest.getInstance("MD5")
      .digest(s"n$i".getBytes).map("%02x".format(_)).mkString).mkString  // 2112 hex chars
    val out = Seq(("rep", repetitive), ("prose", prose), ("noise", noise))
      .toDF("k", "text")
      .select($"k", org.apache.spark.sql.functions.octet_length($"text").as("raw"),
        dl($"text").as("d"))
      .as[(String, Int, Int)].collect().map(r => r._1 -> r).toMap
    def bp(t: (String, Int, Int)) = t._3 * 10000L / t._2
    assert(bp(out("rep")) < 500, s"repetition should crush: ${bp(out("rep"))} bp")
    assert(bp(out("prose")) > bp(out("rep")) && bp(out("prose")) < 8000,
      s"prose in the natural band: ${bp(out("prose"))} bp")
    assert(bp(out("noise")) > bp(out("prose")),
      s"noise must compress worst: ${bp(out("noise"))} vs ${bp(out("prose"))}")
    // deterministic across evaluations (same JVM/zlib): kernel twice + Column
    assert(graft.functions.CompressFns.deflatedLen(
      org.apache.spark.unsafe.types.UTF8String.fromString(prose)) == out("prose")._3)
    // the text_compress invariants hold on these shapes too
    for (t <- out.values) {
      assert(t._3 >= 2 && t._3 <= t._2 + 64)
    }
  }

  test("deflate_len: null in, null out; non-string rejected at analysis") {
    val row = Seq(Tuple1[String](null)).toDF("s").select(dl($"s")).head()
    assert(row.isNullAt(0))
    val ex = intercept[org.apache.spark.sql.AnalysisException] {
      Seq(Tuple1(1)).toDF("x").select(dl($"x")).collect()
    }
    assert(ex.getMessage.toLowerCase.contains("string"), ex.getMessage)
  }
}
