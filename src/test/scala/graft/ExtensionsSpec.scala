package graft

import org.apache.spark.sql.{GraftSqlShims, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier

/** The spark.sql.extensions path: applying `GraftExtensions` to a
  * SparkSessionExtensions must register every injected piece — the
  * custom functions, the as-of planner strategy, and the HMAC round-trip
  * optimizer rule — exactly what a session built with
  * `spark.sql.extensions=graft.GraftExtensions` receives on a cluster.
  * (Extensions only apply at session construction, so this asserts on
  * the extensions object's contributions rather than spawning a second
  * session.)
  */
class ExtensionsSpec extends SparkSpec {

  private lazy val (registry, strategies, rules) = {
    val ext = new SparkSessionExtensions
    new GraftExtensions().apply(ext)
    GraftSqlShims.extensionContributions(ext, spark)
  }

  test("injects the three custom functions into a registry") {
    Seq("hmac_tokenize", "hmac_detokenize", "graft_dot").foreach { fn =>
      assert(registry.functionExists(FunctionIdentifier(fn)), fn)
    }
  }

  test("injects the as-of and range-join planner strategies") {
    assert(strategies.contains(graft.plans.AsOfJoinStrategy))
    assert(strategies.contains(graft.plans.RangeJoinStrategy))
  }

  test("injects the HMAC round-trip optimizer rule") {
    assert(rules.contains(graft.privacy.EliminateHmacRoundTrip))
  }
}
