package graft.ops

import graft.functions.VectorFunctions
import graft.search.Knn
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.BucketedRandomProjectionLSH
import org.apache.spark.ml.linalg.{Vectors, Vector => MLVector}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Approximate nearest-neighbor search over an `ARRAY<FLOAT>` embedding
  * column (builder brief): brute-force is the exact baseline
  * ([[graft.search.Knn]]); the scale paths here trade recall for pruning.
  *
  * - LSH: random hyperplane projections bucket the index once; a query
  *   probes only its buckets. Index never re-shuffles per query.
  * - IVF: a KMeans coarse quantizer partitions the index by nearest
  *   centroid; a query scans only `nProbe` inverted lists. This is the
  *   layout a 100 TB index wants on disk: `partitionBy(centroid_id)` makes
  *   probing = partition pruning at the parquet scan.
  */
object Ann {

  private val toMl = udf { a: Seq[Float] =>
    Vectors.dense(a.map(_.toDouble).toArray)
  }
  private val toArr = udf { v: MLVector => v.toArray.map(_.toFloat) }

  // ----------------------------------------------------------------- LSH

  /** Fit a bucketed-random-projection model (L2 LSH) on the index. */
  def fitLsh(
      index: DataFrame,
      vecCol: String = "embedding",
      bucketLength: Double = 2.0,
      numHashTables: Int = 4): (DataFrame, BucketedRandomProjectionLSHModelWrapper) = {
    val withMl = index.withColumn("__ml", toMl(col(vecCol)))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__ml").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(withMl)
    (model.transform(withMl), new BucketedRandomProjectionLSHModelWrapper(model))
  }

  /** Single-query ANN top-k through the fitted LSH model. */
  def lshTopK(
      hashed: DataFrame,
      model: BucketedRandomProjectionLSHModelWrapper,
      queryVec: Array[Float],
      k: Int,
      idCol: String = "vec_id"): DataFrame = {
    val q = Vectors.dense(queryVec.map(_.toDouble))
    model.underlying.approxNearestNeighbors(hashed, q, k, "dist")
      .select(col(idCol), round(col("dist"), 6).as("dist"))
  }

  /** Batch ANN: many queries against a fitted LSH index in ONE join — the
    * LSH analog of [[graft.search.Knn.topKBatch]]. Per-query
    * `approxNearestNeighbors` re-plans the index scan for every query; at
    * 100 TB with a query *table* the right shape is:
    *
    *  1. hash the queries through the already-fitted model (transform only,
    *     no fit — queries must live in the index's hash space);
    *  2. explode both sides' hash tables to `(band, bucket)` keys;
    *  3. equi-join on the key, query side broadcast (queries ≪ index, so
    *     the index never shuffles for the join);
    *  4. exact distance on the candidates (codegen, map-side — the shuffle
    *     that follows carries only `(query_id, id, dist)` scalars);
    *  5. dedup multi-band collisions, then bounded-heap top-k per query.
    *
    * Recall = P(any of the `numHashTables` bands collide); tune
    * `bucketLength`/`numHashTables` at fit time, not here.
    */
  def lshTopKBatch(
      queries: DataFrame,
      hashed: DataFrame,
      model: BucketedRandomProjectionLSHModelWrapper,
      k: Int,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val idType = hashed.schema(idCol).dataType
    require(
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType,
      s"lshTopKBatch id column '$idCol' must be integral, got $idType")
    import org.apache.spark.ml.functions.vector_to_array
    val qHashed = model.underlying
      .transform(queries.withColumn("__ml", toMl(col(queryVecCol))))
    def bands(df: DataFrame, keep: Seq[Column]): DataFrame =
      df.select(keep :+ posexplode(col("__hashes")).as(Seq("band", "__hv")): _*)
        .withColumn("__bucket", element_at(vector_to_array(col("__hv")), 1))
        .drop("__hv")
    val qBands = bands(qHashed, Seq(col(queryIdCol), col(queryVecCol)))
    val iBands = bands(hashed, Seq(col(idCol), col(vecCol)))
    val cands = iBands
      .join(broadcast(qBands), Seq("band", "__bucket"))
      .withColumn("dist", VectorFunctions.l2Distance(col(vecCol), col(queryVecCol)))
      .select(col(queryIdCol), col(idCol), col("dist"))
      .dropDuplicates(queryIdCol, idCol)
    cands
      .groupBy(col(queryIdCol))
      .agg(call_function("topk_by_dist",
        col("dist"), col(idCol).cast("long"), lit(k)).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(
        col(queryIdCol),
        (col("r") + 1).cast("int").as("rank"),
        col("hit.id").as(idCol),
        col("hit.dist").as("dist"))
  }

  /** Cosine near-dup pairs at scale: normalize to the unit sphere (cos sim
    * ⇔ L2 dist: ‖a−b‖² = 2−2cos), then LSH `approxSimilarityJoin` — the
    * bucketed path [[Dedup.cosinePairsExact]] escalates to.
    */
  def cosinePairsLsh(
      emb: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "embedding",
      minCos: Double = 0.95,
      bucketLength: Double = 0.5,
      numHashTables: Int = 4): DataFrame = {
    val normed = emb.withColumn("__norm",
      sqrt(aggregate(transform(col(vecCol), x => x.cast("double") * x.cast("double")),
        lit(0.0), (a, b) => a + b)))
      .where(col("__norm") > 0)
      .withColumn("__unit", transform(col(vecCol), x => x.cast("double") / col("__norm")))
      .withColumn("__ml", udf { a: Seq[Double] => Vectors.dense(a.toArray) }.apply(col("__unit")))
    val lsh = new BucketedRandomProjectionLSH()
      .setInputCol("__ml").setOutputCol("__hashes")
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(42L)
    val model = lsh.fit(normed)
    val maxL2 = math.sqrt(math.max(0.0, 2.0 - 2.0 * minCos))
    model.approxSimilarityJoin(normed, normed, maxL2, "l2")
      .select(
        col(s"datasetA.$idCol").as("id_a"),
        col(s"datasetB.$idCol").as("id_b"),
        round(lit(1.0) - col("l2") * col("l2") / 2.0, 6).as("cos"))
      .where(col("id_a") < col("id_b"))
      .orderBy(col("id_a"), col("id_b"))
  }

  // ----------------------------------------------------------------- IVF

  /** Build an IVF index: KMeans coarse centroids + per-vector assignment.
    * Returns (assigned index with `centroid_id`, centroid table). Persist
    * the assigned index `partitionBy("centroid_id")` and probing becomes
    * parquet partition pruning.
    */
  def buildIvf(
      index: DataFrame,
      vecCol: String = "embedding",
      nLists: Int = 16): (DataFrame, DataFrame) = {
    val withMl = index.withColumn("__ml", toMl(col(vecCol)))
    // coarse quantizer: cluster quality barely moves recall past ~10
    // iterations, and build time is dominated by the fit
    val km = new KMeans().setK(nLists).setSeed(42L).setMaxIter(10)
      .setFeaturesCol("__ml").setPredictionCol("centroid_id")
    val model = km.fit(withMl)
    val spark = index.sparkSession
    import spark.implicits._
    val centroids = model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat)) }
      .toSeq.toDF("centroid_id", "centroid")
    (model.transform(withMl).drop("__ml"), centroids)
  }

  /** Persist an IVF index partitioned by centroid: probing N lists becomes
    * parquet partition pruning — the on-disk layout a 100 TB ANN index
    * wants (each query touches nProbe directories, not the full scan).
    */
  def writeIvf(assigned: DataFrame, centroids: DataFrame, path: String): Unit = {
    assigned.write.mode("overwrite")
      .partitionBy("centroid_id").parquet(s"$path/lists")
    centroids.write.mode("overwrite").parquet(s"$path/centroids")
  }

  def loadIvf(spark: SparkSession, path: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$path/lists"), spark.read.parquet(s"$path/centroids"))

  /** Batch IVF: a query *table* probed in one pass. Per query, rank the
    * centroids (tiny broadcast cross join: |queries| × nLists rows) and
    * keep the `nProbe` nearest; join the probe list back to the assigned
    * index on `centroid_id` with the probe side broadcast — the index
    * never shuffles, and each index row is scored only against the queries
    * that probe its list. Bounded-heap top-k finishes per query.
    *
    * vs [[ivfTopK]]: the single-query path prunes partitions (each query
    * touches nProbe directories); the batch path amortizes ONE index scan
    * across all queries, which is the right trade once the union of probe
    * lists approaches the whole index.
    */
  def ivfTopKBatch(
      assigned: DataFrame,
      centroids: DataFrame,
      queries: DataFrame,
      k: Int,
      nProbe: Int = 4,
      queryIdCol: String = "query_id",
      queryVecCol: String = "query_vec",
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val idType = assigned.schema(idCol).dataType
    require(
      idType == org.apache.spark.sql.types.LongType ||
        idType == org.apache.spark.sql.types.IntegerType,
      s"ivfTopKBatch id column '$idCol' must be integral, got $idType")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(queryIdCol)).orderBy(col("cdist"), col("centroid_id"))
    val probes = queries
      .crossJoin(broadcast(centroids))
      .withColumn("cdist",
        VectorFunctions.l2Distance(col("centroid"), col(queryVecCol)))
      .withColumn("__r", row_number().over(w))
      .where(col("__r") <= nProbe)
      .select(col(queryIdCol), col(queryVecCol), col("centroid_id"))
    assigned
      .join(broadcast(probes), Seq("centroid_id"))
      .withColumn("dist", VectorFunctions.l2Distance(col(vecCol), col(queryVecCol)))
      .select(col(queryIdCol), col(idCol), col("dist"))
      .groupBy(col(queryIdCol))
      .agg(call_function("topk_by_dist",
        col("dist"), col(idCol).cast("long"), lit(k)).as("topk"))
      .select(col(queryIdCol), posexplode(col("topk")).as(Seq("r", "hit")))
      .select(
        col(queryIdCol),
        (col("r") + 1).cast("int").as("rank"),
        col("hit.id").as(idCol),
        col("hit.dist").as("dist"))
  }

  /** IVF query: rank centroids by distance to the query, then scan only
    * the `nProbe` nearest lists. The probe ids (≤ nLists ints) are
    * resolved on the driver so the list filter is a *literal* predicate —
    * on a centroid-partitioned index that is static partition pruning,
    * guaranteed at plan time (a semi-join would rely on DPP heuristics).
    */
  def ivfTopK(
      assigned: DataFrame,
      centroids: DataFrame,
      queryVec: Array[Float],
      k: Int,
      nProbe: Int = 4,
      idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val probeIds = centroids
      .withColumn("cdist", VectorFunctions.l2Distance(col("centroid"), typedlit(queryVec)))
      .orderBy(col("cdist"), col("centroid_id"))
      .limit(nProbe)
      .select("centroid_id")
      .collect()
      .map(_.getInt(0))
    val candidates = assigned.where(col("centroid_id").isin(probeIds.map(Int.box): _*))
    Knn.topKWithScore(candidates, queryVec, k, idCol, vecCol)
  }
}

/** Thin serializable handle so callers don't need the mllib type. */
class BucketedRandomProjectionLSHModelWrapper(
    val underlying: org.apache.spark.ml.feature.BucketedRandomProjectionLSHModel)
  extends Serializable
