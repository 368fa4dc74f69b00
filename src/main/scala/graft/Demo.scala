package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end flagship pipeline — the Spark twin of the reference's
  * 8-step `make demo` (Makefile:45-70: data → land → ingest → transform →
  * warehouse → analytics → ML → report, ≤10 min on a laptop at 500
  * subjects, seed 42). Same steps, same scale, one `main`:
  *
  *   1. deterministic synthetic SDTM (500 subjects, seed 42)
  *   2. validated landing → hive-partitioned bronze (fail-fast DQ)
  *   3. bronze → silver (partition-key routed domain mapping)
  *   4. staging + star warehouse (dims, facts, outcomes marts)
  *   5. curated analytics (AE rates by arm, arm mix, risk crosstab)
  *   6. ML: features → scaler+logistic pipeline → AUC/AP gate
  *   7. registry governance (register → Staging → Production + report)
  *   8. ingest/quality report JSON + per-step timing summary
  *
  * Usage: `runMain graft.Demo [outDir]`. Prints one `DEMO_OK` line with
  * step seconds; artifacts land under outDir.
  */
object Demo {
  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-demo").toString)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val steps = run(spark, outDir, nSubjects = 500)
    // Locale.ROOT: comma-decimal locales would corrupt the parsed line
    println("DEMO_OK " + steps.map { case (k, v) =>
      k + "=" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    }.mkString(" "))
    spark.stop()
  }

  /** Run all steps; returns (step, seconds) in order. */
  def run(spark: SparkSession, outDir: String, nSubjects: Int): Seq[(String, Double)] = {
    val timings = Seq.newBuilder[(String, Double)]
    def step[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      timings += name -> (System.nanoTime() - t0) / 1e9
      r
    }
    val runTs = to_timestamp(lit("2024-06-01 00:00:00"))

    val domains = step("generate") {
      val d = standards.SyntheticSdtm.allDomains(spark, nSubjects, 42L)
      // cache + count so generation cost lands in THIS step's timing —
      // a bare count() materializes nothing and every later step would
      // re-run the generators
      d.values.foreach(_.cache().count())
      d
    }
    val results = step("bronze") {
      // red/green DQ demo like the reference's GE gating: the generator
      // seeds one invalid SEX='X' row (SUBJ0000) — first landing attempt
      // must FAIL fail-fast, then the quarantined fix lands green. The DM
      // rules come from the DECLARATIVE suite document (the reference
      // declares its gates as GE suite JSON files, not code) — the gate
      // reads the actual suite file via SuiteLoader.
      val dmSuite = checks.SuiteLoader.fromResource("graft/suites/dm_suite.json")
      val suites = io.Medallion.domainChecks.updated("DM", dmSuite.rowChecks)
      val red = io.Medallion.landToBronze(domains, "STUDY001", s"$outDir/bronze",
        checkSuites = suites)
      require(red.exists(r => !r.passed), "seeded bad row was not caught")
      val clean = domains.updated("DM",
        domains("DM").filter(col("SUBJID") =!= "SUBJ0000"))
      io.Medallion.landToBronze(clean, "STUDY001", s"$outDir/bronze",
        checkSuites = suites)
    }
    require(results.size == 5 && results.forall(_.passed), "bronze DQ gate failed")
    val dm = domains("DM").filter(col("SUBJID") =!= "SUBJ0000")
    step("silver") {
      io.Medallion.bronzeToSilver(spark, s"$outDir/bronze", "STUDY001", s"$outDir/silver")
    }
    val (dim, outcomes) = step("warehouse") {
      val stgDm = standards.Sdtm.stgDemographics(dm, "STUDY001", runTs)
      val stgAe = standards.Sdtm.stgAdverseEvents(domains("AE"), "STUDY001", runTs)
      val stgLb = standards.Sdtm.stgLaboratory(domains("LB"), "STUDY001", runTs)
      val stgVs = standards.Sdtm.stgVitalSigns(domains("VS"), "STUDY001", runTs)
      val stgEx = standards.Sdtm.stgExposure(domains("EX"), "STUDY001", runTs)
      val d = warehouse.Star.dimSubject(dm)
      val summary = warehouse.Star.intSubjectSummary(stgDm, stgAe, stgLb, stgVs, stgEx)
      val o = warehouse.Star.factSubjectOutcomes(summary, runTs)
      o.write.mode("overwrite").parquet(s"$outDir/warehouse/fact_subject_outcomes")
      (d, o)
    }
    step("analytics") {
      val factAe = warehouse.Star.factAdverseEvents(domains("AE"), dim)
      val a1 = analytics.ClinicalAnalytics.aeRatesByArm(factAe, dim)
      val a2 = analytics.ClinicalAnalytics.armDistribution(dim)
      val a3 = analytics.ClinicalAnalytics.riskCrosstab(outcomes)
      Seq("ae_rates_by_arm" -> a1, "arm_distribution" -> a2, "risk_crosstab" -> a3)
        .foreach { case (n, df) =>
          df.write.mode("overwrite").parquet(s"$outDir/analytics/$n") }
    }
    val metrics = step("ml") {
      val features = ml.RiskModel.subjectFeatures(dm, domains("AE"))
      val (train, test) = ml.RiskModel.stratifiedSplit(features)
      val model = ml.RiskModel.pipeline().fit(train)
      val m = ml.RiskModel.evaluate(model, test)
      require(ml.RiskModel.passesGate(m), s"ML gate failed: $m")
      ml.RiskModel.scoreBatch(model, features)
        .write.mode("overwrite").parquet(s"$outDir/scores")
      m
    }
    step("registry") {
      val log = new ml.Registry.EventLog(s"$outDir/registry/events.jsonl")
      val tags = Map("owner" -> "demo", "dataset" -> "sdtm_synth",
        "training_date" -> "2024-06-01")
      val t0 = 1717200000000L // 2024-06-01T00:00:00Z
      log.register("risk_model", 1, t0, tags,
        Map("auc" -> metrics.auc, "ap" -> metrics.averagePrecision))
      log.transition(spark, "risk_model", 1, "Staging", t0 + 1000L)
      log.transition(spark, "risk_model", 1, "Production", t0 + 2000L)
    }
    step("report") {
      // FS-agnostic write: same call lands the report on s3a:// in
      // production (reference ingest_csv.py:166-190)
      io.Medallion.writeReport(spark, s"$outDir/ingest_report.json", results)
    }
    timings.result()
  }
}
