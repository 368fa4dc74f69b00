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

  /** M3 — assembler → scaler → logistic regression (reference: sklearn
    * C=1.0 L2, max_iter=200, `ml/train.py:233-239`). Default is
    * UNREGULARIZED: MLlib's `regParam` is λ on the per-sample-averaged
    * objective, so sklearn's C=1.0 corresponds to regParam ≈ 1/n — pass
    * that explicitly to mimic the reference's penalty; the gates compare
    * metric tolerance, not coefficients (object doc), so the default
    * favors the simpler objective. */
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

  /** M4 — binary log-loss (cross-entropy) with the standard probability
    * clip at eps = 1e-15 (sklearn's default, which produced the
    * reference's recorded demo metric
    * `docs/assets/demo/mlflow/metrics.json: log_loss`). One aggregation
    * pass over the scored frame. */
  def logLoss(model: PipelineModel, test: DataFrame): Double = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    val eps = 1e-15
    model.transform(test)
      .select(greatest(least(p1, lit(1.0 - eps)), lit(eps)).as("p"),
        col("label"))
      .agg(avg(when(col("label") === 1.0, -log(col("p")))
        .otherwise(-log(lit(1.0) - col("p")))).as("ll"))
      .head().getDouble(0)
  }

  /** M4 — confusion matrix at `threshold` (`ml/train.py:78-92`,
    * y_pred = y_prob > 0.5): one conditional-aggregate pass over the
    * scored frame, no collect of predictions. */
  final case class ConfusionMatrix(tp: Long, fp: Long, tn: Long, fn: Long) {
    def total: Long = tp + fp + tn + fn
    def accuracy: Double = if (total == 0) 0.0 else (tp + tn).toDouble / total
    def precision: Double = if (tp + fp == 0) 0.0 else tp.toDouble / (tp + fp)
    def recall: Double = if (tp + fn == 0) 0.0 else tp.toDouble / (tp + fn)
    def f1: Double =
      if (precision + recall == 0) 0.0
      else 2 * precision * recall / (precision + recall)
  }

  def confusionMatrix(model: PipelineModel, test: DataFrame,
      threshold: Double = 0.5): ConfusionMatrix = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    val pred = (p1 > threshold).cast("int")
    // coalesce: sum over zero rows is NULL — an empty test set must read
    // as the all-zero matrix, not an NPE
    def cell(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1L).otherwise(0L)), lit(0L))
    val row = model.transform(test)
      .select(pred.as("p"), col("label").cast("int").as("y"))
      .agg(
        cell(col("p") === 1 && col("y") === 1).as("tp"),
        cell(col("p") === 1 && col("y") === 0).as("fp"),
        cell(col("p") === 0 && col("y") === 0).as("tn"),
        cell(col("p") === 0 && col("y") === 1).as("fn"))
      .collect()(0)
    ConfusionMatrix(row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
  }

  /** M4 — ROC curve points (fpr, tpr), `ml/train.py:44-58`. Computed
    * distributed by `BinaryClassificationMetrics`; `numBins` downsamples
    * the curve so the returned point count is bounded at any test-set
    * size (sklearn returns one point per distinct score — unbounded). */
  def rocCurve(model: PipelineModel, test: DataFrame,
      numBins: Int = 100): Seq[(Double, Double)] =
    curveMetrics(model, test, numBins).roc().collect().toSeq

  /** M4 — PR curve points (recall, precision), `ml/train.py:61-75`. */
  def prCurve(model: PipelineModel, test: DataFrame,
      numBins: Int = 100): Seq[(Double, Double)] =
    curveMetrics(model, test, numBins).pr().collect().toSeq

  private def curveMetrics(model: PipelineModel, test: DataFrame, numBins: Int) = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    val scoreAndLabel = model.transform(test)
      .select(p1.as("score"), col("label"))
      .rdd.map(r => (r.getDouble(0), r.getDouble(1)))
    new org.apache.spark.mllib.evaluation.BinaryClassificationMetrics(
      scoreAndLabel, numBins)
  }

  /** M4 — risk-score histogram per actual class (`ml/train.py:94-113`):
    * (label, bin lower edge, count), bins of width 1/`bins`. */
  def scoreDistribution(model: PipelineModel, test: DataFrame,
      bins: Int = 30): DataFrame = {
    val p1 = element_at(vector_to_array(col("probability")), 2)
    model.transform(test)
      .select(col("label"), least(floor(p1 * bins), lit(bins - 1)).as("bin"))
      .groupBy("label", "bin").agg(count(lit(1)).as("n"))
      .select(col("label"), (col("bin") / bins).as("bin_lo"), col("n"))
  }

  /** M4 — feature importance: scaled-space LR coefficients by feature
    * name (`ml/train.py:139-143`). */
  def featureImportance(model: PipelineModel): Map[String, Double] = {
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    FeatureCols.zip(lr.coefficients.toArray).toMap
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

  /** A frozen scoring artifact: the saved scaler statistics + LR weights of
    * a trained pipeline, as plain numbers. The reference's inference path
    * loads a pickled sklearn pipeline (`ml/infer.py:15-26`); this is the
    * same artifact shape with MLlib's (assembler → StandardScaler(withMean,
    * withStd) → LogisticRegression) parameters made explicit, so scoring
    * is pure closed-form arithmetic — deterministic, engine-replayable, and
    * broadcastable (the artifact is O(#features), never data-sized). */
  final case class FrozenRiskModel(
      means: Array[Double], stds: Array[Double],
      coefficients: Array[Double], intercept: Double) {
    require(means.length == FeatureCols.length &&
      stds.length == FeatureCols.length &&
      coefficients.length == FeatureCols.length,
      s"frozen artifact must carry ${FeatureCols.length} per-feature params")
  }

  /** Extract the frozen artifact from a fitted pipeline — the "save the
    * model" half of the infer path (MlSpec proves transform ≡ frozen). */
  def freeze(model: PipelineModel): FrozenRiskModel = {
    val scaler = model.stages(1)
      .asInstanceOf[org.apache.spark.ml.feature.StandardScalerModel]
    val lr = model.stages.last
      .asInstanceOf[org.apache.spark.ml.classification.LogisticRegressionModel]
    FrozenRiskModel(scaler.mean.toArray, scaler.std.toArray,
      lr.coefficients.toArray, lr.intercept)
  }

  /** The demo's pinned production model: stands in for the registry's
    * current Production artifact so batch scoring is oracle-exact (the
    * driver's DuckDB gate replays this arithmetic; a freshly-fitted model's
    * weights could not appear in a static oracle). Values are round numbers
    * on the scale of a fitted run, not a fit. */
  val Frozen: FrozenRiskModel = FrozenRiskModel(
    means = Array(43.5, 10.0, 3.0),
    stds = Array(17.25, 6.5, 2.5),
    coefficients = Array(0.02, 0.12, 0.45),
    intercept = -1.5)

  /** M7 via the frozen artifact: z = b0 + Σ bᵢ·(xᵢ−mᵢ)/sᵢ, RISK = σ(z).
    * Identical arithmetic to `scoreBatch` over a pipeline with these
    * parameters (equivalence pinned in MlSpec); one narrow projection, no
    * ML runtime on the scoring path — at 100 TB this is a map-only stage
    * with the artifact folded into the codegen'd expression. */
  def scoreBatchFrozen(features: DataFrame,
      m: FrozenRiskModel = Frozen): DataFrame = {
    val z = FeatureCols.zipWithIndex.map { case (c, i) =>
      lit(m.coefficients(i)) * ((col(c) - lit(m.means(i))) / lit(m.stds(i)))
    }.foldLeft(lit(m.intercept): org.apache.spark.sql.Column)(_ + _)
    features.select(col("STUDYID"), col("SUBJID"),
      (lit(1.0) / (lit(1.0) + exp(-z))).as("RISK"))
  }

  private def vector_to_array(c: org.apache.spark.sql.Column) =
    org.apache.spark.ml.functions.vector_to_array(c)
}
