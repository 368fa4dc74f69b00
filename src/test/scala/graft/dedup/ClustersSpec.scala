package graft.dedup

import org.scalacheck.Gen
import graft.SparkSpec

class ClustersSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side union-find ground truth. */
  private def unionFind(n: Int, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    nodes.map(x => x -> find(x)).toMap
  }

  test("connected components match union-find on generated graphs") {
    val params = Gen.Parameters.default.withSize(30)
    val seed0 = org.scalacheck.rng.Seed(20260812L)
    val edgeGen = Gen.listOfN(40,
      Gen.zip(Gen.choose(0L, 24L), Gen.choose(0L, 24L)))
    var seed = seed0
    (1 to 5).foreach { _ =>
      val edges = edgeGen(params, seed).get.filter(e => e._1 != e._2)
      seed = seed.next
      val expected = unionFind(25, edges)
      // distributed star loop and driver fast path must both match
      val dist = Clusters.connectedComponents(
          edges.toDF("a", "b"), "a", "b", driverThreshold = 0L)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val fast = Clusters.connectedComponents(
          edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(dist == expected)
      assert(fast == expected)
    }
  }

  test("chain graph collapses to one component rooted at the min") {
    // path 10-11-12-...-19 forces multiple star rounds (diameter 9)
    val edges = (10L until 19L).map(i => (i, i + 1))
    val got = Clusters.connectedComponents(edges.toDF("a", "b"), "a", "b",
        driverThreshold = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == (10L to 19L).map(_ -> 10L).toMap)
  }

  test("canonical assignment flags exactly one keeper per cluster") {
    val pairs = Seq((5L, 9L), (9L, 7L), (2L, 3L)).toDF("id1", "id2")
    val asg = Clusters.canonicalAssignment(pairs, "id1", "id2").collect()
    val byCluster = asg.groupBy(_.getAs[Long]("cluster_id"))
    assert(byCluster.keySet == Set(5L, 2L))
    byCluster.values.foreach { rows =>
      assert(rows.count(_.getAs[Boolean]("is_canonical")) == 1)
      val canon = rows.find(_.getAs[Boolean]("is_canonical")).get
      assert(canon.getAs[Long]("doc_id") == rows.map(_.getAs[Long]("doc_id")).min)
    }
  }

  test("empty pair list yields empty assignment") {
    val empty = Seq.empty[(Long, Long)].toDF("a", "b")
    assert(Clusters.connectedComponents(empty, "a", "b").count() == 0)
  }
}
