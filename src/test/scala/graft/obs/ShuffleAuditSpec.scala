package graft.obs

import graft.SparkSpec
import graft.SparkEntry

class ShuffleAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def audited(name: String): ShuffleAudit.Audit =
    ShuffleAudit.measure(spark) {
      SparkEntry.queries(name)(spark, sf).count()
    }._2

  test("broadcast star join never shuffles the fact side") {
    val star = audited("j1_star_join_broadcast")
    val factBytes = new java.io.File(s"$sf/lineitem.parquet").length()
    // all dims broadcast — only the final tiny agg exchange remains,
    // orders of magnitude under the fact bytes (measured: ~900 B vs the
    // fact parquet)
    assert(star.shuffleWriteBytes < factBytes / 20,
      s"star=${star.shuffleWriteBytes} fact=$factBytes")
  }

  test("partial aggregation shuffles far less than the scan") {
    val (_, agg) = ShuffleAudit.measure(spark) {
      SparkEntry.queries("a1_group_count")(spark, sf).count()
    }
    val inputBytes = new java.io.File(s"$sf/lineitem.parquet").length()
    // map-side combine: shuffle volume is groups x partitions, not rows
    assert(agg.shuffleWriteBytes < inputBytes / 10,
      s"shuffled ${agg.shuffleWriteBytes} of $inputBytes input")
  }

  test("broadcast as-of join moves less shuffle than the union+window form") {
    val exec = audited("aj3_asof_join_broadcast")
    val window = audited("aj1_asof_join")
    assert(exec.shuffleWriteBytes < window.shuffleWriteBytes,
      s"exec=${exec.shuffleWriteBytes} window=${window.shuffleWriteBytes}")
  }

  test("broadcast range join moves less shuffle than the bucketed form") {
    import org.apache.spark.sql.functions._
    val errors = graft.io.Tables.events(spark, sf)
      .filter(col("event_type") === "error").select(col("user_id"), col("ts"))
    // 1-day window so the pair space is non-empty (85 pairs at sf0.001).
    // Disable auto-broadcast: at test scale Spark would broadcast the
    // bucketed join's side too, hiding the shuffle the bucketed plan
    // performs at real scale; the custom exec's BroadcastDistribution is
    // independent of the threshold.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val (_, exec) = ShuffleAudit.measure(spark) {
        graft.ops.TimeJoins.rangeJoinBroadcast(errors, errors, "user_id", "ts", 86400L).count()
      }
      val (_, bucketed) = ShuffleAudit.measure(spark) {
        graft.ops.TimeJoins.rangeJoinBucketed(errors, errors, "user_id", "ts", 86400L).count()
      }
      assert(exec.shuffleWriteBytes < bucketed.shuffleWriteBytes,
        s"exec=${exec.shuffleWriteBytes} bucketed=${bucketed.shuffleWriteBytes}")
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }

  test("bucketed spine join runs shuffle-free (the j2/cp3 100x scale path)") {
    import org.apache.spark.sql.functions._
    val customer = graft.io.Tables.customer(spark, sf)
      .select("c_custkey", "c_name", "c_acctbal")
    val orders = graft.io.Tables.orders(spark, sf)
      .groupBy("o_custkey").agg(count(lit(1)).as("n_orders"),
        sum("o_totalprice").as("spend"))
    // force sort-merge so the exchange (or its absence) is observable
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plain = customer.join(orders,
        customer("c_custkey") === orders("o_custkey"), "left")
      val (_, plainAudit) = ShuffleAudit.measure(spark)(plain.count())
      assert(plainAudit.shuffleWriteBytes > 0,
        "unbucketed spine join must shuffle — else the proof proves nothing")

      graft.ops.Scale.writeBucketed(customer, "cust_b", "c_custkey", 8)
      graft.ops.Scale.writeBucketed(orders, "ord_b", "o_custkey", 8)
      val cb = spark.table("cust_b"); val ob = spark.table("ord_b")
      val bucketed = cb.join(ob, cb("c_custkey") === ob("o_custkey"), "left")
      // string form of the plan sees through the AQE wrapper node
      assert(!bucketed.queryExecution.executedPlan.toString.contains("Exchange"),
        "bucketed join plan must contain no exchange")
      // toRdd.count() executes the join without a count-aggregate on top
      // (whose final reduce would add its own tiny exchange)
      val (n, bAudit) = ShuffleAudit.measure(spark) {
        bucketed.queryExecution.toRdd.count()
      }
      assert(n == customer.count())
      assert(bAudit.shuffleWriteBytes == 0,
        s"bucketed spine join shuffled ${bAudit.shuffleWriteBytes} bytes")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS cust_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }

  test("nothing in the audited queries spills at test scale") {
    Seq("j1_star_join_broadcast", "a1_group_count").foreach { q =>
      val a = audited(q)
      assert(a.memorySpillBytes == 0 && a.diskSpillBytes == 0)
    }
  }
}
