package graft.text

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("token counting: whitespace and BPE-ish runs") {
    val df = Seq(
      ("hello world", 2L, 2L),
      ("  padded   spaces  here ", 3L, 3L),
      ("a,b;c", 1L, 5L), // one ws token; 3 letters + 2 punct marks
      ("x2024y", 1L, 3L)) // letter-run, digit-run, letter-run
      .toDF("text", "ws_expected", "bpe_expected")
      .withColumn("ws", TextFunctions.tokenCount(col("text")))
      .withColumn("bpe", TextFunctions.bpeishTokenCount(col("text")))
    assert(df.filter(col("ws") =!= col("ws_expected")).count() == 0)
    assert(df.filter(col("bpe") =!= col("bpe_expected")).count() == 0)
  }

  test("language ID: marker argmax with first-wins ties and und fallback") {
    val df = Seq(
      ("the cat and the dog", "en"),
      ("der hund und die katze ist", "de"),
      ("el perro y la casa es que", "es"),
      ("le chien et la maison est", "fr"),
      ("xyzzy qwerty plugh", "und"),
      // 'la' is a marker for both es and fr → first language (es) wins
      ("la la la", "es"))
      .toDF("text", "expected")
      .withColumn("got", TextFunctions.detectLang(col("text")))
    val bad = df.filter(col("got") =!= col("expected"))
    assert(bad.count() == 0, bad.collect().mkString(", "))
  }

  test("quality score: long clean prose beats short noisy strings") {
    val clean = "the quick brown fox jumps over the lazy dog and " * 12
    val noisy = "!!!! 737 ??? ;;; 42 !!!"
    val df = Seq(("clean", clean), ("noisy", noisy)).toDF("k", "text")
      .withColumn("q", TextFunctions.qualityScore(col("text")))
      .withColumn("band", TextFunctions.qualityBand(col("text")))
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getString(3))).toMap
    assert(df("clean")._1 > df("noisy")._1)
    assert(df("clean")._2 == "HIGH")
    assert(df("noisy")._2 == "LOW")
  }

  test("normalize + fingerprint: whitespace/case-insensitive, content-sensitive") {
    val df = Seq(
      ("Hello   World", "hello world"),
      ("  hello\tworld  ", "hello world"))
      .toDF("text", "expected_norm")
      .withColumn("norm", TextFunctions.normalize(col("text")))
      .withColumn("fp", TextFunctions.fingerprint(col("text")))
    assert(df.filter(col("norm") =!= col("expected_norm")).count() == 0)
    assert(df.select("fp").distinct().count() == 1) // same canonical form
    val other = Seq("different words").toDF("text")
      .select(TextFunctions.fingerprint(col("text")).as("fp"))
    assert(df.select("fp").intersect(other).count() == 0)
  }

  test("wordSetRatio counts whole tokens only") {
    val r = Seq("the theory then the end").toDF("text")
      .select(TextFunctions.wordSetRatio(col("text"), Seq("the")).as("r"))
      .as[Double].head()
    assert(r == 0.4) // 'the' twice of 5 tokens; 'theory'/'then' excluded
  }

  test("repetitionRatio: 0 for unrepetitive prose, high for loops, 0 below n tokens") {
    def ratio(s: String): Double = Seq(s).toDF("text")
      .select(TextFunctions.repetitionRatio(col("text"), 3).as("r"))
      .as[Double].head()
    assert(ratio("every token here is different always") == 0.0)
    // "a b c a b c a b c": 7 shingles, 3 distinct -> 1 - 3/7
    assert(math.abs(ratio("a b c a b c a b c") - (1.0 - 3.0 / 7.0)) < 1e-6)
    assert(ratio("too short") == 0.0) // fewer than n tokens
  }
}
