package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.standards.SyntheticSdtm

class ObjectStoreSpec extends SparkSpec {

  private def layoutUnderTemp(tag: String): ObjectStore.MedallionLayout = {
    val tmp = Files.createTempDirectory(s"graft-objstore-$tag").toString
    // Explicit scheme: the production path swaps file: for s3a: only.
    ObjectStore.MedallionLayout.under(s"file:$tmp")
  }

  test("configureS3a applies endpoint/credential/committer settings") {
    ObjectStore.configureS3a(spark, ObjectStore.S3Config(
      endpoint = "http://minio.local:9000",
      accessKey = Some("ak"), secretKey = Some("sk"),
      useSsl = false, pathStyleAccess = true))
    val hc = spark.sparkContext.hadoopConfiguration
    assert(hc.get("fs.s3a.endpoint") == "http://minio.local:9000")
    assert(hc.get("fs.s3a.access.key") == "ak")
    assert(hc.get("fs.s3a.secret.key") == "sk")
    assert(hc.get("fs.s3a.connection.ssl.enabled") == "false")
    assert(hc.get("fs.s3a.path.style.access") == "true")
    assert(hc.get("fs.s3a.committer.name") == "magic")
    // the Spark-SQL-side committer bindings are a separate opt-in that
    // requires the spark-hadoop-cloud module; without it on the
    // classpath (this sandbox) the conf setter itself rejects the class
    // — failing at configure time, the documented behavior
    val err = intercept[Throwable](ObjectStore.enableMagicCommitter(spark))
    assert(err.getMessage.contains("PathOutputCommitProtocol"))
  }

  test("ensureRoots + put/get/list round-trip through URI paths") {
    val layout = layoutUnderTemp("rt")
    ObjectStore.ensureRoots(spark, layout)
    ObjectStore.putString(spark, s"${layout.rawRoot}/manifests/m1.json", """{"a":1}""")
    ObjectStore.putString(spark, s"${layout.rawRoot}/manifests/m2.json", """{"a":2}""")
    ObjectStore.putString(spark, s"${layout.rawRoot}/other.txt", "x")
    assert(ObjectStore.getString(spark, s"${layout.rawRoot}/manifests/m1.json") == """{"a":1}""")
    assert(ObjectStore.listKeys(spark, layout.rawRoot, "manifests/") ==
      Seq("manifests/m1.json", "manifests/m2.json"))
    assert(ObjectStore.listKeys(spark, layout.rawRoot).size == 3)
    assert(ObjectStore.listKeys(spark, s"${layout.rawRoot}/nope").isEmpty)
  }

  test("medallion land→bronze→silver through URI roots (S5 over object store)") {
    val layout = layoutUnderTemp("medallion")
    ObjectStore.ensureRoots(spark, layout)
    val domains = SyntheticSdtm.allDomains(spark, 30, 42L)
    val clean = domains.updated("DM",
      domains("DM").filter(col("SUBJID") =!= "SUBJ0000"))

    val results = Medallion.landToBronze(clean, "STUDY001", layout.bronzeRoot)
    assert(results.size == 5 && results.forall(_.passed))

    val silver = Medallion.bronzeToSilver(spark, layout.bronzeRoot,
      "STUDY001", layout.silverRoot)
    assert(silver.size == 5)
    assert(spark.read.parquet(s"${layout.silverRoot}/DM.parquet").count() == 29)

    Medallion.writeReport(spark, s"${layout.rawRoot}/ingest_report.json", results)
    val report = ObjectStore.getString(spark, s"${layout.rawRoot}/ingest_report.json")
    assert(report.contains("\"passed\":true"))

    // compaction also goes through the FS-agnostic path
    val n = Medallion.compact(spark, s"${layout.silverRoot}/DM.parquet")
    assert(n >= 1)
    assert(spark.read.parquet(s"${layout.silverRoot}/DM.parquet").count() == 29)
  }
}
