package graft.sim

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** IVF (inverted-file) approximate nearest neighbors — the classic
  * coarse-quantizer scale path (public design: Sivic/Zisserman "Video
  * Google" posting lists; FAISS IVF-Flat): k-means the corpus into
  * `nLists` cells, store each vector in its cell's posting list, and
  * answer a query by scanning only its `nProbe` closest cells.
  *
  * Spark-first plan: cell assignment is one KMeansModel.transform pass
  * (no shuffle beyond k-means itself); queries broadcast with their probe
  * lists; the probe join shuffles only (cell, query) pairs; per-query
  * top-k runs through the map-side-combining [[TopKAggregator]]. Probe
  * fraction nProbe/nLists bounds the scanned corpus share — at 100 TB
  * with nLists=4096, nProbe=64 each query touches ~1.6% of vectors.
  */
class IVFNearestNeighbors(override val uid: String)
    extends Estimator[IVFNearestNeighborsModel] with HasInputCol {
  def this() = this(Identifiable.randomUID("IVFNearestNeighbors"))

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val nLists = new IntParam(this, "nLists", "k-means cells",
    ParamValidators.gt(0))
  setDefault(nLists -> 64)
  def setNLists(v: Int): this.type = set(nLists, v)
  final val seed = new LongParam(this, "seed", "k-means seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)
  // a coarse quantizer needs rough cells, not convergence: 10 Lloyd
  // iterations is the standard IVF training budget; recall at the gated
  // operating points is asserted by SimilaritySuite either way
  final val maxIter = new IntParam(this, "maxIter",
    "k-means iteration cap", ParamValidators.gt(0))
  setDefault(maxIter -> 10)
  def setMaxIter(v: Int): this.type = set(maxIter, v)

  override def fit(ds: Dataset[_]): IVFNearestNeighborsModel = {
    val df = ds.toDF()
    val withVec = df.withColumn("__vec",
      org.apache.spark.ml.functions.array_to_vector(
        col(getInputCol).cast(ArrayType(DoubleType))))
    // k-means|| init retained: random init was measured to cost 14 recall
    // points (0.90 -> 0.76 recall@5) at the gated 8-cell/4-probe operating
    // point — balanced cells matter more than the ~2 extra init passes
    val km = new KMeans().setK($(nLists)).setSeed($(seed))
      .setMaxIter($(maxIter))
      .setFeaturesCol("__vec").setPredictionCol("__cell")
      .fit(withVec)
    val m = new IVFNearestNeighborsModel(uid + "_model")
    m.set(m.inputCol, getInputCol).set(m.idCol, $(idCol))
    m.kmeans = km
    m.centroids = km.clusterCenters.map(_.toArray)
    m
  }
  override def transformSchema(schema: StructType): StructType =
    IVFNearestNeighborsModel.outputSchema
  override def copy(extra: ParamMap): IVFNearestNeighbors = defaultCopy(extra)
}

class IVFNearestNeighborsModel(override val uid: String)
    extends Model[IVFNearestNeighborsModel] with HasInputCol {
  def this() = this(Identifiable.randomUID("IVFNearestNeighborsModel"))

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  final val k = new IntParam(this, "k", "neighbors per query")
  setDefault(k -> 10)
  def setK(v: Int): this.type = set(k, v)
  final val nProbe = new IntParam(this, "nProbe", "cells scanned per query")
  setDefault(nProbe -> 8)
  def setNProbe(v: Int): this.type = set(nProbe, v)

  var kmeans: org.apache.spark.ml.clustering.KMeansModel = _
  var centroids: Array[Array[Double]] = _

  private var queriesDf: DataFrame = _
  def setQueries(df: DataFrame, queryIdCol: String, vecCol: String): this.type = {
    queriesDf = df.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    this
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    require(queriesDf != null, "setQueries first")
    val df = ds.toDF()
    val spark = df.sparkSession
    // corpus -> cells: one KMeans assignment pass
    val corpus = kmeans.transform(df.withColumn("__vec",
        org.apache.spark.ml.functions.array_to_vector(
          col(getInputCol).cast(ArrayType(DoubleType)))))
      .select(col($(idCol)).cast("long").as("id"),
        col(getInputCol).as("__cv"), col("__cell"))
    // queries -> nProbe closest cells (broadcast centroid matrix is tiny)
    val ctr = spark.sparkContext.broadcast(centroids)
    val np = $(nProbe)
    val probeUdf = udf((q: Seq[Double]) => {
      val cs = ctr.value
      val qa = q.toArray
      cs.indices.map { c =>
        var s = 0.0; var i = 0
        val cc = cs(c)
        while (i < qa.length && i < cc.length) {
          val d = qa(i) - cc(i); s += d * d; i += 1
        }
        (s, c)
      }.sortBy(_._1).take(np).map(_._2)
    })
    val qs = queriesDf
      .withColumn("__cell",
        explode(probeUdf(col("__qv").cast(ArrayType(DoubleType)))))
    val sim = SimilarityFunctions.cosine(col("__qv"), col("__cv"))
    val topk = udaf(new TopKAggregator($(k)), Encoders.product[Scored])
    corpus.join(broadcast(qs), Seq("__cell"))
      .select(col("query_id"), sim.as("score"), col("id"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("id")).as("neighbors"))
  }
  override def transformSchema(schema: StructType): StructType =
    IVFNearestNeighborsModel.outputSchema
  override def copy(extra: ParamMap): IVFNearestNeighborsModel = {
    val c = new IVFNearestNeighborsModel(uid)
    c.kmeans = kmeans; c.centroids = centroids; c.queriesDf = queriesDf
    copyValues(c, extra)
  }
}

object IVFNearestNeighborsModel {
  val outputSchema: StructType = StructType(Seq(
    StructField("query_id", LongType),
    StructField("neighbors", ArrayType(StructType(Seq(
      StructField("score", DoubleType), StructField("id", LongType)))))))
}
