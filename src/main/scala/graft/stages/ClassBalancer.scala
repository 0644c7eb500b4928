package graft.stages

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Computes per-label weight = maxLabelCount / labelCount and joins it back
  * onto the data (ref: core/.../stages/ClassBalancer.scala:25-97).
  *
  * Scale notes: the fit side is one map-side-combinable groupBy over the
  * label column; the weights table has |labels| rows so the transform join
  * is always broadcast (as the reference does with `broadcast(weights)`).
  */
class ClassBalancer(override val uid: String) extends Estimator[ClassBalancerModel]
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ClassBalancer"))
  setDefault(outputCol -> "weight")

  final val broadcastJoin = new BooleanParam(this, "broadcastJoin",
    "broadcast the weights table (always advisable; |labels| rows)")
  setDefault(broadcastJoin -> true)
  def setBroadcastJoin(v: Boolean): this.type = set(broadcastJoin, v)

  override def fit(ds: Dataset[_]): ClassBalancerModel = {
    val counts = ds.toDF().groupBy(getInputCol).agg(count(lit(1)).as("__count"))
    val weights = counts
      .withColumn(getOutputCol,
        (max(col("__count")).over() / col("__count")).cast("double"))
      .drop("__count")
    val m = new ClassBalancerModel(uid + "_model")
      .setInputCol(getInputCol).setOutputCol(getOutputCol)
      .setBroadcastJoin($(broadcastJoin))
    m.weights = weights
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, DoubleType, nullable = false))
  override def copy(extra: ParamMap): ClassBalancer = defaultCopy(extra)
}
object ClassBalancer extends graft.core.GraftReadable[ClassBalancer]


class ClassBalancerModel(override val uid: String) extends Model[ClassBalancerModel]
    with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("ClassBalancerModel"))

  // the weight table is a real (tiny) DataFrame — persist it as parquet
  // so load works from any DFS, schema included
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(ClassBalancerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(ClassBalancerModel.this))
        weights.write.mode("overwrite").parquet(s"$path/weights.parquet")
      }
    }

  final val broadcastJoin = new BooleanParam(this, "broadcastJoin", "broadcast join")
  setDefault(broadcastJoin -> true)
  def setBroadcastJoin(v: Boolean): this.type = set(broadcastJoin, v)

  /** label -> weight table, |distinct labels| rows. */
  var weights: DataFrame = _

  override def transform(ds: Dataset[_]): DataFrame = {
    val w = if ($(broadcastJoin)) broadcast(weights) else weights
    ds.toDF().join(w, Seq(getInputCol), "left")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, DoubleType, nullable = false))
  override def copy(extra: ParamMap): ClassBalancerModel = {
    val c = new ClassBalancerModel(uid); c.weights = weights; copyValues(c, extra)
  }
}

object ClassBalancerModel
    extends org.apache.spark.ml.util.MLReadable[ClassBalancerModel] {
  override def read: org.apache.spark.ml.util.MLReader[ClassBalancerModel] =
    new org.apache.spark.ml.util.MLReader[ClassBalancerModel] {
      override def load(path: String): ClassBalancerModel = {
        val m = new ClassBalancerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.weights = sparkSession.read.parquet(s"$path/weights.parquet")
        m
      }
    }
}
