package graft.dedup

import org.apache.spark.sql.functions._
import graft.SparkSpec

class LinkageSpec extends SparkSpec {
  import spark.implicits._

  private lazy val people = Seq(
    (1L, "smith john"),
    (2L, "smith jon"),      // distance 1 to id 1, same block
    (3L, "smith johnathan"), // distance 5 to id 1
    (4L, "jones john"),     // different block: never compared to smiths
    (5L, "jones jhon"))     // distance 2 to id 4
    .toDF("id", "name")

  private val firstToken = split(col("name"), " ").getItem(0)

  test("pairs form only inside the block and respect the distance cap") {
    val pairs = Linkage.fuzzyPairs(people, "id", "name", firstToken, maxDistance = 2)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Long]("distance")).toMap
    assert(pairs == Map((1L, 2L) -> 1L, (4L, 5L) -> 2L))
  }

  test("raising the cap admits the farther in-block pair, never cross-block") {
    val pairs = Linkage.fuzzyPairs(people, "id", "name", firstToken, maxDistance = 6)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2"))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)))
  }

  test("NULL blocking keys never match anything") {
    val withNull = people.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("id", "name"))
    val pairs = Linkage.fuzzyPairs(withNull, "id", "name", firstToken, 100)
    assert(pairs.filter(col("id1") === 9L || col("id2") === 9L).count() == 0)
  }

  test("length-band + thresholded levenshtein prune, distances stay exact") {
    // "smith johnathan" is 5 edits from "smith john": below a cap of 5 the
    // pair must survive both prunes with the TRUE distance (the -1 sentinel
    // from the thresholded form must never leak into output).
    val pairs = Linkage.fuzzyPairs(people, "id", "name", firstToken, 5)
      .collect().map(r => (r.getAs[Long]("id1"), r.getAs[Long]("id2")) ->
        r.getAs[Long]("distance")).toMap
    assert(pairs((1L, 3L)) == 5L)
    assert(pairs.values.forall(d => d >= 0 && d <= 5))
  }

  test("linkDistinct collapses duplicates and carries record counts") {
    val dup = Seq((1L, "smith john"), (2L, "smith john"), (3L, "smith john"),
      (4L, "smith jon"), (5L, "jones john")).toDF("id", "name")
    val out = Linkage.linkDistinct(dup, "name", firstToken, maxDistance = 2)
      .collect()
    // one distinct-value pair, not 3×1 record pairs; counts recover mass
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[String]("name1") == "smith john")
    assert(r.getAs[String]("name2") == "smith jon")
    assert(r.getAs[Long]("distance") == 1L)
    assert(r.getAs[Long]("n1") == 3L && r.getAs[Long]("n2") == 1L)
  }
}
