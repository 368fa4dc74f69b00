package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF-style approximate nearest neighbor: a k-means coarse quantizer
  * assigns every vector to its nearest centroid (the "inverted file"
  * cell); queries probe only the `nProbe` closest cells and brute-force
  * inside them with the codegen'd cosine. This is the learned-bucket
  * alternative to [[Ann.knnLshBucketed]] — same probe/join shape, cells
  * adapt to the data distribution instead of being random hyperplanes.
  *
  * At 100 TB the index build is one KMeans fit on a sample + one scan to
  * assign cells (written partitioned by cell id); a query touches
  * `nProbe / nCells` of the corpus.
  */
object Ivf {

  final case class Index(assigned: DataFrame, centroids: Array[Array[Double]])

  /** Build the IVF index: fit k-means on (a sample of) the corpus, then
    * assign every vector its cell id. */
  def build(emb: DataFrame, idCol: String, vecCol: String, nCells: Int,
      seed: Long = 42L): Index = {
    val vectorized = emb.withColumn("__features",
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setFeaturesCol("__features")
      .setPredictionCol("__cell")
      .fit(vectorized)
    val assigned = model.transform(vectorized).drop("__features")
    Index(assigned, model.clusterCenters.map(_.toArray))
  }

  /** Top-k by cosine among the `nProbe` cells nearest to the query vector
    * (by euclidean centroid distance, the standard IVF probe rule). The
    * query row is collected ONCE and rebuilt as literals — one corpus
    * scan per query (the probe), not two. */
  def knn(index: Index, idCol: String, vecCol: String, queryId: Long,
      k: Int, nProbe: Int): DataFrame = {
    val spark = index.assigned.sparkSession
    graft.functions.ArrayDotProduct.register(spark)
    val qRow = index.assigned.filter(col(idCol) === queryId)
      .select(col(vecCol).cast("array<double>"), col("__cell")).head()
    // cast above makes the collected element type dtype-agnostic:
    // build() accepts float or double corpora
    val qVec = qRow.getSeq[Double](0).toArray
    val probeCells = index.centroids.zipWithIndex
      .map { case (c, i) =>
        val d2 = c.zip(qVec).map { case (a, b) => (a - b) * (a - b) }.sum
        (i, d2)
      }
      .sortBy(_._2).take(nProbe).map(_._1)
    val qNorm = math.sqrt(qVec.map(x => x * x).sum)
    val qVecLit = typedlit(qVec.toSeq)
    index.assigned
      .filter(col("__cell").isin(probeCells.map(Integer.valueOf): _*))
      .filter(col(idCol) =!= queryId)
      .select(col(idCol),
        Ann.cosineOrZero(
          Ann.dot(col(vecCol).cast("array<double>"), qVecLit),
          Ann.norm(col(vecCol).cast("array<double>")), lit(qNorm))
          .as("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }
}
