package graft.conf

import java.nio.file.{Files, Paths}

import com.fasterxml.jackson.databind.JsonNode
import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

import graft.io.ObjectStore
import graft.io.ObjectStore.{MedallionLayout, S3Config}

/** Layered engine configuration (reference `config.py:170-197`):
  * typed defaults → `configs/config.<env>.yaml` → environment-variable
  * overrides, with fail-fast validation of insecure prod settings
  * (`config.py:201-218` refuses staging/prod with missing secrets/SSL).
  *
  * Scope: the ENGINE's knobs — object-store endpoint/credentials, the four
  * medallion tier roots, freshness SLO, ingest chunk size, shuffle
  * parallelism, the ML promotion gate, registry expiry, PII redaction.
  * The reference's serving-layer settings (FastAPI keys, MLflow tracking
  * URI, Streamlit) are out of engine scope (SURVEY §1).
  *
  * YAML keys mirror the reference's `configs/config.local.yaml` shape
  * (`storage.s3_endpoint`, `storage.*_bucket`, `use_ssl`, …) so an
  * operator can carry their config file over nearly verbatim.
  */
final case class GraftConfig(
    env: String = "local",
    storage: S3Config = S3Config(),
    layout: MedallionLayout = MedallionLayout.s3("clinical"),
    freshnessSloMinutes: Int = 120,
    ingestChunkRows: Int = 5000,
    shufflePartitions: Int = 32,
    mlMinAuc: Double = 0.65,
    mlMinAp: Double = 0.60,
    modelMaxAgeDays: Int = 90,
    piiRedaction: Boolean = true) {

  /** Bind this config to a session: s3a endpoint/credentials + shuffle
    * parallelism. Returns the session for chaining. */
  def configure(spark: SparkSession): SparkSession = {
    ObjectStore.configureS3a(spark, storage)
    spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
    spark
  }
}

object GraftConfig {

  /** defaults → YAML (if `configs/config.<env>.yaml` exists under
    * `configDir`) → env overrides → validation. `env` is injectable for
    * tests; production callers use the real `sys.env`. */
  def load(configDir: String = "configs",
      env: Map[String, String] = sys.env): GraftConfig = {
    val envName = env.getOrElse("GRAFT_ENV", "local").toLowerCase
    val yamlPath = Paths.get(s"$configDir/config.$envName.yaml")
    val fromFile =
      if (Files.exists(yamlPath))
        fromYaml(new String(Files.readAllBytes(yamlPath),
          java.nio.charset.StandardCharsets.UTF_8))
      else GraftConfig()
    validated(overrideFromEnv(fromFile.copy(env = envName), env))
  }

  /** Parse the reference-shaped YAML document into a config (absent keys
    * keep their defaults — the reference's pydantic semantics). */
  def fromYaml(yaml: String): GraftConfig = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    def node(path: String*): Option[JsonNode] =
      path.foldLeft(Option(root)) { (n, k) => n.flatMap(x => Option(x.get(k))) }
    def str(d: String, path: String*) = node(path: _*).map(_.asText).getOrElse(d)
    def opt(path: String*) = node(path: _*).map(_.asText)
    def int(d: Int, path: String*) = node(path: _*).map(_.asInt).getOrElse(d)
    def dbl(d: Double, path: String*) = node(path: _*).map(_.asDouble).getOrElse(d)
    def bool(d: Boolean, path: String*) = node(path: _*).map(_.asBoolean).getOrElse(d)

    val defaults = GraftConfig()
    val scheme = str("s3a", "storage", "scheme")
    def bucket(tier: String, default: String) =
      s"$scheme://${str(default, "storage", s"${tier}_bucket")}"
    GraftConfig(
      env = str(defaults.env, "env"),
      storage = S3Config(
        endpoint = str(defaults.storage.endpoint, "storage", "s3_endpoint"),
        accessKey = opt("storage", "access_key"),
        secretKey = opt("storage", "secret_key"),
        useSsl = bool(defaults.storage.useSsl, "storage", "use_ssl"),
        pathStyleAccess =
          bool(defaults.storage.pathStyleAccess, "storage", "path_style_access")),
      layout = MedallionLayout(
        rawRoot = bucket("raw", "clinical-raw"),
        bronzeRoot = bucket("bronze", "clinical-bronze"),
        silverRoot = bucket("silver", "clinical-silver"),
        goldRoot = bucket("gold", "clinical-gold")),
      freshnessSloMinutes =
        int(defaults.freshnessSloMinutes, "engine", "freshness_slo_minutes"),
      ingestChunkRows = int(defaults.ingestChunkRows, "engine", "ingest_chunk_rows"),
      shufflePartitions =
        int(defaults.shufflePartitions, "engine", "shuffle_partitions"),
      mlMinAuc = dbl(defaults.mlMinAuc, "ml", "min_auc"),
      mlMinAp = dbl(defaults.mlMinAp, "ml", "min_ap"),
      modelMaxAgeDays = int(defaults.modelMaxAgeDays, "ml", "model_max_age_days"),
      piiRedaction =
        bool(defaults.piiRedaction, "security", "enable_pii_redaction"))
  }

  /** Environment variables override the file (reference BaseSettings
    * semantics). Only set variables override; absent ones keep the merged
    * value. */
  private def overrideFromEnv(c: GraftConfig, env: Map[String, String]): GraftConfig = {
    def s(k: String, d: String) = env.getOrElse(k, d)
    def o(k: String, d: Option[String]) = env.get(k).orElse(d)
    def i(k: String, d: Int) = env.get(k).map(_.toInt).getOrElse(d)
    def dd(k: String, d: Double) = env.get(k).map(_.toDouble).getOrElse(d)
    def b(k: String, d: Boolean) = env.get(k).map(_.toBoolean).getOrElse(d)
    c.copy(
      storage = c.storage.copy(
        endpoint = s("GRAFT_S3_ENDPOINT", c.storage.endpoint),
        accessKey = o("GRAFT_S3_ACCESS_KEY", c.storage.accessKey),
        secretKey = o("GRAFT_S3_SECRET_KEY", c.storage.secretKey),
        useSsl = b("GRAFT_S3_USE_SSL", c.storage.useSsl)),
      layout = c.layout.copy(
        rawRoot = s("GRAFT_RAW_ROOT", c.layout.rawRoot),
        bronzeRoot = s("GRAFT_BRONZE_ROOT", c.layout.bronzeRoot),
        silverRoot = s("GRAFT_SILVER_ROOT", c.layout.silverRoot),
        goldRoot = s("GRAFT_GOLD_ROOT", c.layout.goldRoot)),
      freshnessSloMinutes = i("GRAFT_FRESHNESS_SLO_MINUTES", c.freshnessSloMinutes),
      ingestChunkRows = i("GRAFT_INGEST_CHUNK_ROWS", c.ingestChunkRows),
      shufflePartitions = i("GRAFT_SHUFFLE_PARTITIONS", c.shufflePartitions),
      mlMinAuc = dd("GRAFT_ML_MIN_AUC", c.mlMinAuc),
      mlMinAp = dd("GRAFT_ML_MIN_AP", c.mlMinAp),
      modelMaxAgeDays = i("GRAFT_MODEL_MAX_AGE_DAYS", c.modelMaxAgeDays),
      piiRedaction = b("GRAFT_PII_REDACTION", c.piiRedaction))
  }

  /** Fail-fast on insecure staging/prod settings (the engine twin of
    * `config.py:201-218`): TLS required, no localhost endpoint, and PII
    * redaction may not be disabled outside local/dev. */
  /** inet_aton-compatible IPv4 literal parse: 1–4 dot-separated parts,
    * each decimal, octal (leading 0), or hex (0x); the last part fills
    * the remaining bytes. Returns the 32-bit address for hosts that ARE
    * such literals, None for DNS names / IPv6 / malformed input. This is
    * the loosest spelling a libc-based client accepts, which is the
    * right parser for a deny-gate. */
  private[conf] def inetAtonLiteral(host: String): Option[Long] = {
    val parts = host.split("\\.", -1)
    if (parts.isEmpty || parts.length > 4 || parts.exists(_.isEmpty)) return None
    def part(p: String): Option[Long] =
      try {
        if (p.matches("0[xX][0-9a-fA-F]+"))
          Some(java.lang.Long.parseLong(p.drop(2), 16))
        else if (p.length > 1 && p.charAt(0) == '0' && p.matches("[0-7]+"))
          Some(java.lang.Long.parseLong(p, 8))
        else if (p.matches("[0-9]+")) Some(java.lang.Long.parseLong(p))
        else None
      } catch { case _: NumberFormatException => None }
    val vals = parts.toSeq.map(part)
    if (vals.exists(_.isEmpty)) return None
    val v = vals.map(_.get)
    val lastBytes = 5 - v.length // bytes covered by the final part
    val headOk = v.init.forall(x => x >= 0 && x <= 255)
    val lastMax = (1L << (8 * lastBytes)) - 1
    if (!headOk || v.last < 0 || v.last > lastMax) return None
    val head = v.init.zipWithIndex.map { case (x, i) => x << (8 * (3 - i)) }.sum
    Some(head + v.last)
  }

  private def validated(c: GraftConfig): GraftConfig = {
    require(Seq("local", "dev", "staging", "prod").contains(c.env),
      s"unknown env '${c.env}'")
    if (c.env == "staging" || c.env == "prod") {
      require(c.storage.useSsl, s"${c.env} requires use_ssl=true")
      // reject the whole loopback space by HOST, not substring: any
      // 127.0.0.0/8 address, IPv6 ::1 (also IPv4-mapped), 0.0.0.0, and
      // "localhost" — substring checks both miss 127.0.0.2 and
      // false-positive on hosts merely containing "0.0.0.0"
      val endpoint = c.storage.endpoint
      val withScheme =
        if (endpoint.contains("://")) endpoint else s"s3://$endpoint"
      // java.net.URI.getHost is null for authorities it deems invalid reg
      // names (e.g. the partial-form literal "127.1"), so fall back to
      // manual authority extraction rather than to the raw endpoint string
      val host = (Option(
        try new java.net.URI(withScheme).getHost
        catch { case _: Exception => null })
        .getOrElse {
          val auth = withScheme.substring(withScheme.indexOf("://") + 3)
            .takeWhile(ch => ch != '/' && ch != '?' && ch != '#')
          val noUser = auth.substring(auth.indexOf('@') + 1)
          if (noUser.startsWith("[")) noUser.takeWhile(_ != ']')
          else noUser.takeWhile(_ != ':')
        })
        .stripPrefix("[").stripSuffix("]")
      val nameIsLoopback = host.equalsIgnoreCase("localhost") ||
        host == "0.0.0.0" || host == "::1" || host == "::" ||
        host.startsWith("127.") || host.startsWith("::ffff:127.")
      // non-dotted-quad IPv4 spellings (decimal "2130706433", partial
      // "127.1", hex "0x7f000001", octal "0177.0.0.1") still reach 127/8
      // through libc-style clients, so parse them the way the LOOSEST
      // client (inet_aton) would — Java's own parser accepts only some of
      // these. DNS names are never resolved here: a config validator must
      // not do network I/O, and a name that happens to resolve to
      // loopback is a deployment concern, not a config-document fault.
      val parsedIsLoopback = inetAtonLiteral(host).exists(a =>
        (a >>> 24) == 127L || a == 0L)
      // IPv6 literals have their own non-canonical spellings ("0::1",
      // "0:0:0:0:0:0:0:1", IPv4-mapped hex "::ffff:7f00:1") — a host
      // containing ':' can only be an IPv6 literal (DNS labels cannot),
      // so InetAddress.getByName parses it WITHOUT any lookup and the
      // address class check covers every spelling at once
      val v6IsLoopback = host.contains(":") && (try {
        val a = java.net.InetAddress.getByName(host)
        a.isLoopbackAddress || a.isAnyLocalAddress
      } catch { case _: Exception => false })
      require(!nameIsLoopback && !parsedIsLoopback && !v6IsLoopback,
        s"${c.env} cannot point at a loopback object store ($host)")
      require(c.piiRedaction, s"${c.env} cannot disable PII redaction")
    }
    require(c.freshnessSloMinutes > 0 && c.shufflePartitions > 0 &&
      c.ingestChunkRows > 0, "engine knobs must be positive")
    require(c.mlMinAuc >= 0 && c.mlMinAuc <= 1 && c.mlMinAp >= 0 && c.mlMinAp <= 1,
      "ML gate thresholds must be in [0,1]")
    c
  }
}
