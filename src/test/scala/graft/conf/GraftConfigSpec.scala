package graft.conf

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

class GraftConfigSpec extends AnyFunSuite {

  private val yaml =
    """env: dev
      |storage:
      |  s3_endpoint: http://minio.internal:9000
      |  access_key: ak
      |  secret_key: sk
      |  use_ssl: false
      |  raw_bucket: t-raw
      |  bronze_bucket: t-bronze
      |  silver_bucket: t-silver
      |  gold_bucket: t-gold
      |engine:
      |  freshness_slo_minutes: 60
      |  shuffle_partitions: 8
      |ml:
      |  min_auc: 0.7
      |""".stripMargin

  test("defaults -> yaml -> env override layering") {
    val dir = Files.createTempDirectory("graft-conf").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/config.dev.yaml"), yaml)
    val c = GraftConfig.load(dir, Map(
      "GRAFT_ENV" -> "dev",
      "GRAFT_S3_ENDPOINT" -> "http://minio2:9000", // env beats yaml
      "GRAFT_MODEL_MAX_AGE_DAYS" -> "30"))         // env beats default
    assert(c.env == "dev")
    assert(c.storage.endpoint == "http://minio2:9000")
    assert(c.storage.accessKey.contains("ak"))
    assert(c.layout.bronzeRoot == "s3a://t-bronze")
    assert(c.freshnessSloMinutes == 60)      // yaml beats default
    assert(c.shufflePartitions == 8)
    assert(c.mlMinAuc == 0.7)
    assert(c.mlMinAp == 0.60)                // untouched default survives
    assert(c.modelMaxAgeDays == 30)
    assert(c.ingestChunkRows == 5000)
  }

  test("missing yaml file falls back to pure defaults + env") {
    val dir = Files.createTempDirectory("graft-conf-empty").toString
    val c = GraftConfig.load(dir, Map.empty)
    assert(c.env == "local" && c.freshnessSloMinutes == 120)
    assert(c.layout.rawRoot == "s3a://clinical-raw")
  }

  test("prod refuses insecure defaults, local allows them") {
    val dir = Files.createTempDirectory("graft-conf-prod").toString
    // localhost endpoint + no ssl are fine locally
    GraftConfig.load(dir, Map("GRAFT_ENV" -> "local", "GRAFT_S3_USE_SSL" -> "false"))
    intercept[IllegalArgumentException] {
      GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod", "GRAFT_S3_USE_SSL" -> "false"))
    }
    intercept[IllegalArgumentException] { // default endpoint is localhost
      GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod"))
    }
    intercept[IllegalArgumentException] {
      GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod",
        "GRAFT_S3_ENDPOINT" -> "https://s3.example.com",
        "GRAFT_PII_REDACTION" -> "false"))
    }
    // fully specified prod config passes
    val ok = GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod",
      "GRAFT_S3_ENDPOINT" -> "https://s3.example.com"))
    assert(ok.env == "prod" && ok.storage.useSsl)
  }

  test("prod rejects the whole loopback space by host, not substring") {
    val dir = Files.createTempDirectory("graft-conf-loop").toString
    // any 127.0.0.0/8 address and IPv6 loopback spellings are refused
    // …including non-dotted-quad literal spellings that still parse into
    // 127/8 (decimal, partial-form, hex) — caught by the InetAddress
    // literal parse, not string prefixes
    for (ep <- Seq("https://127.0.0.2:9000", "https://127.99.0.1:9000",
        "https://[::1]:9000", "https://[::ffff:127.0.0.1]:9000",
        "https://0.0.0.0:9000", "https://2130706433:9000",
        "https://127.1:9000", "https://0x7f000001:9000",
        "https://0177.0.0.1:9000", "https://0x7f.1:9000",
        "https://[0:0:0:0:0:0:0:1]:9000", "https://[0::1]:9000",
        "https://[::ffff:7f00:1]:9000")) {
      intercept[IllegalArgumentException] {
        GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod",
          "GRAFT_S3_ENDPOINT" -> ep))
      }
    }
    // a host merely CONTAINING a loopback-like substring is legitimate
    val ok = GraftConfig.load(dir, Map("GRAFT_ENV" -> "prod",
      "GRAFT_S3_ENDPOINT" -> "https://bucket-0.0.0.0-metrics.example.com"))
    assert(ok.env == "prod")
  }
}
