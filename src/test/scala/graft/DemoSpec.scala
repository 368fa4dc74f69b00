package graft

class DemoSpec extends SparkSpec {

  test("8-step demo pipeline runs end-to-end and leaves all artifacts") {
    val out = java.nio.file.Files.createTempDirectory("graft-demo-spec").toString
    val steps = Demo.run(spark, out, nSubjects = 200)
    assert(steps.map(_._1) == Seq("generate", "bronze", "silver", "warehouse",
      "analytics", "ml", "registry", "report"))
    // every step produced its artifact
    Seq("bronze", "silver", "warehouse/fact_subject_outcomes",
      "analytics/ae_rates_by_arm", "analytics/arm_distribution",
      "analytics/risk_crosstab", "scores", "registry/events.jsonl",
      "ingest_report.json")
      .foreach { p => assert(new java.io.File(s"$out/$p").exists(), p) }
    // the model reached Production in the governance log
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/registry/events.jsonl"))
      .contains("Production"))
    assert(spark.read.parquet(s"$out/scores").count() == 199) // minus bad row
  }
}
