package graft.sim

import org.apache.spark.ml.clustering.{KMeans, KMeansModel}
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: k-means partitions the
  * corpus into `nCells` Voronoi cells; a query searches only the `nProbe`
  * cells whose centroids are nearest. The standard scale path when
  * hyperplane LSH recall plateaus (cells adapt to the data distribution;
  * random hyperplanes don't).
  *
  * Spark-first shape:
  *  - index build = `ml.clustering.KMeans` fit (sampled if huge) + one
  *    `transform` pass assigning each vector a cell id — an offline,
  *    embarrassingly parallel job;
  *  - the assigned frame is meant to be PERSISTED PARTITIONED BY CELL
  *    (`.write.partitionBy("ivf_cell")`): probing then becomes partition
  *    pruning — a 100-cell index with nProbe=4 reads 4% of a 100 TB corpus
  *    from the scan on down, no custom source needed;
  *  - query-time centroid ranking is driver-side over nCells small vectors
  *    (the same economics as [[Similarity.probeSignatures]]).
  */
object Ivf {

  /** Train the cell partitioner and assign every vector its cell.
    * Returns (model, assigned frame = input + `ivf_cell` int column). */
  def build(embeddings: DataFrame, vecCol: String,
            nCells: Int, seed: Long = 42L, maxIter: Int = 20): (KMeansModel, DataFrame) = {
    val featCol = "__ivf_feat"
    val withFeat = embeddings.withColumn(featCol,
      array_to_vector(col(vecCol).cast("array<double>")))
    val model = new KMeans()
      .setK(nCells).setSeed(seed).setMaxIter(maxIter)
      .setFeaturesCol(featCol).setPredictionCol("ivf_cell")
      .fit(withFeat)
    (model, model.transform(withFeat).drop(featCol))
  }

  /** Cells to probe for `query`, nearest centroid first (euclidean — the
    * metric k-means optimized). Driver-side over nCells centroids. */
  def probeCells(model: KMeansModel, query: Seq[Float], nProbe: Int): Seq[Int] = {
    val q = query.map(_.toDouble).toArray
    model.clusterCenters.zipWithIndex
      .map { case (c, i) =>
        val d = c.toArray.zip(q).map { case (a, b) => (a - b) * (a - b) }.sum
        (d, i)
      }
      .sortBy(_._1).take(nProbe).map(_._2).toSeq
  }

  /** ANN top-k by cosine within the probed cells. `assigned` is the frame
    * from [[build]] (or read back from a cell-partitioned table, where the
    * isin filter prunes whole partitions). */
  def topK(assigned: DataFrame, model: KMeansModel, vecCol: String, idCol: String,
           query: Seq[Float], k: Int, nProbe: Int = 4): DataFrame = {
    val cells = probeCells(model, query, nProbe)
    val q = array(query.map(lit): _*)
    assigned
      .where(col("ivf_cell").isin(cells: _*))
      .select(col(idCol), Similarity.cosine(col(vecCol), q).as("cos"))
      .orderBy(col("cos").desc, col(idCol))
      .limit(k)
  }
}
