package graft.ml

import org.apache.spark.ml.{Pipeline, PipelineModel}
import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.evaluation.BinaryClassificationEvaluator
import org.apache.spark.ml.feature.{StandardScaler, VectorAssembler}
import org.apache.spark.ml.tuning.{CrossValidator, ParamGridBuilder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's ML surface (SURVEY.md §2.10, M1–M7) on MLlib:
  * subject-level features → StandardScaler → LogisticRegression with the
  * same hyperparameters (C=1.0 ↔ regParam=1/C=1.0 scaled by n handled by
  * MLlib's different objective — gates are on metric tolerance, not
  * coefficient equality, SURVEY §7.3 #4), stratified split, AUC/AP
  * evaluation, 5-fold CV, performance gates, batch scoring.
  */
object RiskModel {

  /** M1 — `analytics/feature_eng.py:10-45`: DM ⟕ AE counts ⟕ severe-AE
    * counts with zero-fill; label = any severe/serious AE. */
  def subjectFeatures(dm: DataFrame, ae: DataFrame): DataFrame = {
    val aeCounts = ae.groupBy("STUDYID", "SUBJID")
      .agg(count(lit(1)).as("AE_COUNT"))
    val severeCounts = ae
      .filter(col("AESEV").isin("SEVERE", "SERIOUS"))
      .groupBy("STUDYID", "SUBJID")
      .agg(count(lit(1)).as("SEVERE_AE_COUNT"))
    dm.select("STUDYID", "SUBJID", "AGE")
      .join(aeCounts, Seq("STUDYID", "SUBJID"), "left")
      .join(severeCounts, Seq("STUDYID", "SUBJID"), "left")
      .na.fill(0, Seq("AE_COUNT", "SEVERE_AE_COUNT"))
      .withColumn("label", (col("SEVERE_AE_COUNT") > 0).cast("double"))
  }

  val FeatureCols: Array[String] = Array("AGE", "AE_COUNT", "SEVERE_AE_COUNT")

  /** M3 — assembler → scaler → logistic regression (C=1.0, max_iter=200,
    * `ml/train.py:233-239`). */
  def pipeline(maxIter: Int = 200, regParam: Double = 0.0): Pipeline = {
    val assembler = new VectorAssembler()
      .setInputCols(FeatureCols).setOutputCol("rawFeatures")
      .setHandleInvalid("skip")
    val scaler = new StandardScaler()
      .setInputCol("rawFeatures").setOutputCol("features")
      .setWithMean(true).setWithStd(true)
    val lr = new LogisticRegression()
      .setMaxIter(maxIter).setRegParam(regParam)
      .setFeaturesCol("features").setLabelCol("label")
    new Pipeline().setStages(Array(assembler, scaler, lr))
  }

  /** M2 — stratified 70/30 split by label (`ml/train.py:229-231`),
    * deterministic under `seed`. */
  def stratifiedSplit(features: DataFrame, seed: Long = 42L)
      : (DataFrame, DataFrame) = {
    val train = features.stat.sampleBy("label",
      Map(0.0 -> 0.7, 1.0 -> 0.7), seed)
    val test = features.exceptAll(train)
    (train, test)
  }

  final case class Metrics(auc: Double, averagePrecision: Double)

  /** M4 — ROC-AUC + average precision (`ml/train.py:124-135`). */
  def evaluate(model: PipelineModel, test: DataFrame): Metrics = {
    val scored = model.transform(test)
    val auc = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderROC").evaluate(scored)
    val ap = new BinaryClassificationEvaluator()
      .setMetricName("areaUnderPR").evaluate(scored)
    Metrics(auc, ap)
  }

  /** M5 — 5-fold CV on AUC (`ml/train.py:135`). */
  def crossValidate(features: DataFrame, seed: Long = 42L): Double = {
    val cv = new CrossValidator()
      .setEstimator(pipeline())
      .setEvaluator(new BinaryClassificationEvaluator().setMetricName("areaUnderROC"))
      .setEstimatorParamMaps(new ParamGridBuilder().build())
      .setNumFolds(5).setSeed(seed)
    cv.fit(features).avgMetrics.head
  }

  /** M6 — performance gate AUC ≥ 0.65 ∧ AP ≥ 0.60 (`ml/train.py:336-342`). */
  def passesGate(m: Metrics, minAuc: Double = 0.65, minAp: Double = 0.60): Boolean =
    m.auc >= minAuc && m.averagePrecision >= minAp

  /** M7 — batch scoring to a RISK column (`ml/infer.py:15-26`). */
  def scoreBatch(model: PipelineModel, features: DataFrame): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    model.transform(features)
      .select(col("STUDYID"), col("SUBJID"), p1.as("RISK"))
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
