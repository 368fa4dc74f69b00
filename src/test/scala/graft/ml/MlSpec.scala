package graft.ml

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.standards.SyntheticSdtm

class MlSpec extends SparkSpec {

  private lazy val dm = SyntheticSdtm.dm(spark, 120, 42L)
  private lazy val ae = SyntheticSdtm.ae(spark, 120, 42L)
  private lazy val features = RiskModel.subjectFeatures(dm, ae)

  test("M1 features: one row per subject, zero-filled counts, binary label") {
    assert(features.count() == 120)
    assert(features.filter(col("AE_COUNT").isNull).count() == 0)
    val labels = features.select("label").distinct()
      .collect().map(_.getDouble(0)).toSet
    assert(labels.subsetOf(Set(0.0, 1.0)))
    // label consistency: label=1 iff severe count > 0
    assert(features.filter((col("SEVERE_AE_COUNT") > 0) =!= (col("label") === 1.0))
      .count() == 0)
  }

  test("M2/M3/M4/M6: train, evaluate, gate — AUC must be high (label is derivable)") {
    val (train, test) = RiskModel.stratifiedSplit(features)
    assert(train.count() + test.count() == 120)
    val model = RiskModel.pipeline().fit(train)
    val m = RiskModel.evaluate(model, test)
    assert(m.auc >= 0.9, s"auc=${m.auc}") // SEVERE_AE_COUNT is a feature
    assert(RiskModel.passesGate(m))
    assert(!RiskModel.passesGate(RiskModel.Metrics(0.5, 0.5)))
  }

  test("M3-M7 golden-metrics drift gate: pinned-seed run stays within tolerance") {
    // The reference publishes demo anchors (docs/assets/demo/mlflow/
    // metrics.json: accuracy 0.9474, log_loss 0.1757) and hard gates
    // (ml/train.py:336-342: AUC >= 0.65, AP >= 0.60). The clean fixture
    // is perfectly separable (label derivable from SEVERE_AE_COUNT →
    // every metric saturates at 1.0, useless for drift detection), so
    // this gate flips 10% of labels deterministically (seeded SUBJID
    // hash) to land metrics in the reference's good-but-imperfect band,
    // then pins the MEASURED goldens of the full pipeline (features →
    // stratified split → scaler→LR fit → evaluate) at seed 42.
    // Tolerances (±0.05 rank metrics/accuracy, ±0.10 log-loss) absorb
    // BLAS/JVM/Spark-version float drift; a real regression — solver
    // change, split skew, scaling bug, probability miscalibration —
    // moves these metrics far more than the tolerance.
    val noisy = features.withColumn("label",
      when(pmod(xxhash64(col("SUBJID"), lit(7L)), lit(10L)) === 0L,
        lit(1.0) - col("label")).otherwise(col("label")))
    val (train, test) = RiskModel.stratifiedSplit(noisy)
    val model = RiskModel.pipeline().fit(train)
    val m = RiskModel.evaluate(model, test)
    val cm = RiskModel.confusionMatrix(model, test)
    val ll = RiskModel.logLoss(model, test)
    assert(math.abs(m.auc - 0.900000) <= 0.05, s"auc drifted: ${m.auc}")
    assert(math.abs(m.averagePrecision - 0.750935) <= 0.05,
      s"ap drifted: ${m.averagePrecision}")
    assert(math.abs(cm.accuracy - 0.926829) <= 0.05,
      s"accuracy drifted: ${cm.accuracy} (reference demo anchor 0.9474)")
    assert(math.abs(ll - 0.499456) <= 0.10,
      s"log-loss drifted: $ll (reference demo anchor 0.1757)")
    // the reference's published promotion gates must also hold on the
    // noisy problem — they are the weaker check
    assert(RiskModel.passesGate(m))
  }

  test("M4 completeness: confusion matrix, ROC/PR curves, score dist, importance") {
    val (train, test) = RiskModel.stratifiedSplit(features)
    val model = RiskModel.pipeline().fit(train)
    val nTest = test.count()

    val cm = RiskModel.confusionMatrix(model, test)
    assert(cm.total == nTest, s"matrix total ${cm.total} != $nTest")
    assert(cm.accuracy >= 0.0 && cm.accuracy <= 1.0)
    assert(cm.precision >= 0.0 && cm.precision <= 1.0)
    assert(cm.f1 >= 0.0 && cm.f1 <= 1.0)
    // threshold extremes: everything predicted positive / negative
    val all = RiskModel.confusionMatrix(model, test, threshold = -0.1)
    assert(all.tn == 0 && all.fn == 0 && all.total == nTest)
    val none = RiskModel.confusionMatrix(model, test, threshold = 1.1)
    assert(none.tp == 0 && none.fp == 0 && none.total == nTest)
    // empty test set: all-zero matrix, defined accuracy — not an NPE
    val empty = RiskModel.confusionMatrix(model, test.limit(0))
    assert(empty == RiskModel.ConfusionMatrix(0, 0, 0, 0))
    assert(empty.accuracy == 0.0 && empty.f1 == 0.0)

    // ROC: within the unit square, monotone non-decreasing, ends at (1,1)
    val roc = RiskModel.rocCurve(model, test)
    assert(roc.nonEmpty && roc.last == ((1.0, 1.0)))
    assert(roc.forall { case (x, y) => x >= 0 && x <= 1 && y >= 0 && y <= 1 })
    assert(roc.sliding(2).forall {
      case Seq((x1, y1), (x2, y2)) => x2 >= x1 && y2 >= y1
      case _ => true
    })

    // PR: recall axis monotone non-decreasing, values in the unit square
    val pr = RiskModel.prCurve(model, test)
    assert(pr.nonEmpty)
    assert(pr.forall { case (r, p) => r >= 0 && r <= 1 && p >= 0 && p <= 1 })
    assert(pr.sliding(2).forall {
      case Seq((r1, _), (r2, _)) => r2 >= r1
      case _ => true
    })

    // score histogram partitions the test set; bins within [0, 1)
    val dist = RiskModel.scoreDistribution(model, test)
    assert(dist.agg(sum("n")).collect()(0).getLong(0) == nTest)
    val los = dist.select("bin_lo").collect().map(_.getDouble(0))
    assert(los.forall(lo => lo >= 0.0 && lo < 1.0))

    // coefficients: one per feature; severe-AE count must dominate
    // positively (the label is derived from it)
    val imp = RiskModel.featureImportance(model)
    assert(imp.keySet == RiskModel.FeatureCols.toSet)
    assert(imp("SEVERE_AE_COUNT") > 0.0)
    assert(imp("SEVERE_AE_COUNT") == imp.values.max)
  }

  test("M7 batch scoring emits RISK probabilities in [0,1]") {
    val model = RiskModel.pipeline().fit(features)
    val scored = RiskModel.scoreBatch(model, features)
    assert(scored.columns.toSeq == Seq("STUDYID", "SUBJID", "RISK"))
    val risks = scored.select("RISK").collect().map(_.getDouble(0))
    assert(risks.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("M7 frozen-artifact scoring ≡ MLlib pipeline transform (m7 oracle chain)") {
    // The m7_batch_score oracle gates scoreBatchFrozen's closed-form
    // arithmetic; this test closes the chain by proving that arithmetic IS
    // the MLlib scoring path: fit a real pipeline, freeze its scaler
    // stats + LR weights, and require frozen scores to match transform's
    // probabilities to float-noise tolerance on every subject.
    val model = RiskModel.pipeline().fit(features)
    val frozen = RiskModel.freeze(model)
    val a = RiskModel.scoreBatch(model, features)
      .select(col("SUBJID"), col("RISK").as("r_ml"))
    val b = RiskModel.scoreBatchFrozen(features, frozen)
      .select(col("SUBJID"), col("RISK").as("r_fr"))
    val joined = a.join(b, "SUBJID")
      .select(abs(col("r_ml") - col("r_fr")).as("d"))
      .agg(max(col("d")).as("maxd")).collect()(0).getDouble(0)
    assert(joined < 1e-9, s"frozen vs transform max |Δrisk| = $joined")
    // and the pinned demo artifact stays a valid probability emitter
    val pinned = RiskModel.scoreBatchFrozen(features)
      .select("RISK").collect().map(_.getDouble(0))
    assert(pinned.forall(r => r > 0.0 && r < 1.0))
  }

  test("M8 registry: state machine enforces the reference's transitions") {
    val dir = Files.createTempDirectory("graft-registry").toString
    val log = new Registry.EventLog(s"$dir/events.jsonl")
    val tags = Map("owner" -> "team", "dataset" -> "sdtm", "training_date" -> "2024-06-01")
    log.register("risk", 1, 1000L, tags, Map("auc" -> 0.9))
    assert(log.currentStage(spark, "risk", 1).contains("None"))
    log.transition(spark, "risk", 1, "Staging", 2000L)
    log.transition(spark, "risk", 1, "Production", 3000L)
    assert(log.currentStage(spark, "risk", 1).contains("Production"))
    // illegal: Production -> None is not a transition
    intercept[Registry.TransitionRejected] {
      log.transition(spark, "risk", 1, "None", 4000L)
    }
    // rollback and archive are legal
    log.transition(spark, "risk", 1, "Staging", 5000L)
    log.transition(spark, "risk", 1, "Archived", 6000L)
    assert(log.currentStage(spark, "risk", 1).contains("Archived"))
  }

  test("M8 registry: concurrent appends get distinct monotonic seqs") {
    val dir = Files.createTempDirectory("graft-registry-conc").toString
    val path = s"$dir/events.jsonl"
    val log = new Registry.EventLog(path)
    val tags = Map("owner" -> "t", "dataset" -> "d", "training_date" -> "2024-01-01")
    val threads = (0 until 8).map { i =>
      new Thread(() => (0 until 25).foreach { j =>
        log.append(Registry.Event(s"m$i", j, "None", 42L, tags, Map.empty))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    // a second instance on the same file (simulated foreign writer) must
    // observe the existing lines and continue the sequence, not restart it
    new Registry.EventLog(path)
      .append(Registry.Event("other", 1, "None", 42L, tags, Map.empty))
    val seqs = spark.read.json(path).select("seq").collect().map(_.getLong(0)).sorted
    assert(seqs.length == 201)
    assert(seqs.toSeq == (0L until 201L))
  }

  test("M8 registry: required tags and expiry report") {
    val dir = Files.createTempDirectory("graft-registry2").toString
    val log = new Registry.EventLog(s"$dir/events.jsonl")
    intercept[IllegalArgumentException] {
      log.register("m", 1, 0L, Map("owner" -> "x"), Map.empty) // missing tags
    }
    val tags = Map("owner" -> "t", "dataset" -> "d", "training_date" -> "2024-01-01")
    log.register("m", 1, 0L, tags, Map.empty)
    val now = 91L * 86400000L // 91 days later
    val report = log.governanceReport(spark, now).collect()(0)
    assert(report.getAs[Boolean]("expired"))
    assert(report.getAs[Long]("age_days") == 91L)
  }
}
