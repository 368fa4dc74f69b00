package graft.text

import graft.SparkSpec
import org.apache.spark.sql.functions._

class WinnowingSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side replica of the packed-min selection for tiny docs: the
    * reference implementation the distributed path must equal. */
  private def localFingerprints(text: String, k: Int, w: Int): Set[(Long, Long)] = {
    val toks = text.trim.split("\\s+").toSeq
    val nsh = toks.length - (k - 1)
    if (nsh < 1) return Set.empty
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(s: String): Long = {
      val hex = md.digest(s.getBytes("UTF-8")).take(4)
        .map(b => f"${b & 0xff}%02x").mkString
      java.lang.Long.parseLong(hex, 16)
    }
    val comb = (0 until nsh).map { p =>
      h32(toks.slice(p, p + k).mkString(" ")) * 16777216L + (16777215L - p)
    }
    (0 to math.max(nsh - w, 0)).map { j =>
      val m = comb.slice(j, math.min(j + w, nsh)).min
      (m / 16777216L, 16777215L - m % 16777216L)
    }.toSet
  }

  test("distributed selection equals the local reference implementation") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "x y z x y z x y z"),
      (3L, "one two three"), // exactly one shingle
      (4L, "just two"),      // < k tokens: no fingerprints
      (5L, "p q r s")        // fewer shingles than the window
    ).toDF("doc_id", "text")
    val got = Winnowing.fingerprints(docs, "doc_id", "text", k = 3, w = 4)
      .as[(Long, Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(t => (t._2, t._3)).toSet).toMap
    for ((id, text) <- Seq(1L -> "a b c d e f g h i j",
        2L -> "x y z x y z x y z", 3L -> "one two three",
        5L -> "p q r s")) {
      assert(got(id) == localFingerprints(text, 3, 4), s"doc $id")
    }
    assert(!got.contains(4L))
  }

  test("guarantee: a shared run of w+k-1 tokens yields a shared fingerprint") {
    // 200 random-ish token docs sharing only one 6-token span (k=3, w=4 →
    // guarantee threshold w+k−1 = 6), surrounded by disjoint vocabulary
    val shared = "alpha beta gamma delta epsilon zeta"
    val a = (1 to 80).map(i => s"left$i").mkString(" ") + " " + shared +
      " " + (1 to 80).map(i => s"tail$i").mkString(" ")
    val b = (1 to 80).map(i => s"right$i").mkString(" ") + " " + shared +
      " " + (1 to 80).map(i => s"end$i").mkString(" ")
    val fps = Winnowing.fingerprints(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text")
    val sharedHashes = fps.groupBy("fp_hash")
      .agg(countDistinct("doc_id").as("n")).filter(col("n") === 2).count()
    assert(sharedHashes >= 1)
  }

  test("density: winnowing keeps a strict subset of shingles, none lost per doc") {
    val docs = graft.io.Tables.documents(spark, "/root/testdata/sf0.001").limit(50)
    val nsh = docs.filter(col("text").isNotNull)
      .select(greatest(size(split(trim(col("text")), "\\s+")) - 2, lit(0))
        .as("n")).agg(sum("n")).head().getLong(0)
    val fps = Winnowing.fingerprints(docs, "doc_id", "text").count()
    assert(fps > 0 && fps < nsh)
    // every doc with at least one shingle has at least one fingerprint
    val withSh = docs.filter(col("text").isNotNull)
      .filter(size(split(trim(col("text")), "\\s+")) >= 3).count()
    val withFp = Winnowing.fingerprints(docs, "doc_id", "text")
      .select("doc_id").distinct().count()
    assert(withFp == withSh)
  }

  test("identical documents pair at overlap 1.0; disjoint documents never pair") {
    val text = (1 to 40).map(i => s"tok${i % 11}").mkString(" ")
    val other = (1 to 40).map(i => s"other${i % 13}").mkString(" ")
    val pairs = Winnowing.sharedFingerprintPairs(
      Seq((1L, text), (2L, text), (3L, other)).toDF("doc_id", "text"),
      "doc_id", "text", minOverlap = 0.0)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L)))
    assert(pairs.head._6 == 1.0)
  }
}
