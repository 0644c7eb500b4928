package graft.nn

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.linalg.{Vector => MLVector}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact k-NN: collect (features, id) to the driver, build a [[BallTree]],
  * broadcast it, query per row in a UDF (ref: nn/KNN.scala:1-126). Exact and
  * fast up to driver-memory corpus sizes; for 100 TB corpora use
  * [[graft.sim.LSHNearestNeighbors]] — the documented scale-out path
  * (SURVEY §2.13 / build plan hard-parts note).
  */
class KNN(override val uid: String) extends Estimator[KNNModel]
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("KNN"))
  setDefault(outputCol -> "matches")

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val k = new IntParam(this, "k", "neighbors", ParamValidators.gt(0))
  setDefault(k -> 5)
  def setK(v: Int): this.type = set(k, v)
  final val leafSize = new IntParam(this, "leafSize", "ball tree leaf size")
  setDefault(leafSize -> 50)

  /** Optional conditioner label column enables ConditionalKNN-style search. */
  final val labelCol = new Param[String](this, "labelCol", "conditioner labels")
  def setLabelCol(v: String): this.type = set(labelCol, v)

  /** Exact KNN's contract collects the fitted corpus to the driver (the
    * reference's own design); this bound makes that explicit instead of
    * letting a 100x corpus growth surface as a driver OOM mid-collect.
    * Default 5M rows ~ a few GB of doubles at typical dims (SCALING.md). */
  final val maxCollectRows = new LongParam(this, "maxCollectRows",
    "fail fit() when the corpus exceeds this many rows (driver-collected)",
    ParamValidators.gt(0))
  setDefault(maxCollectRows -> 5000000L)
  def setMaxCollectRows(v: Long): this.type = set(maxCollectRows, v)

  private[nn] def extractVec(r: org.apache.spark.sql.Row, i: Int): Array[Double] =
    r.get(i) match {
      case v: MLVector => v.toArray
      case s: scala.collection.Seq[_] => s.map {
        case f: Float => f.toDouble
        case d: Double => d
        case n: Number => n.doubleValue()
      }.toArray
      case other => throw new IllegalArgumentException(s"bad feature type $other")
    }

  override def fit(ds: Dataset[_]): KNNModel = {
    val df = ds.toDF()
    val hasLabels = isSet(labelCol)
    val cols = Seq(col(getInputCol), col($(idCol)).cast("long")) ++
      (if (hasLabels) Seq(col($(labelCol)).cast("int")) else Nil)
    // bound + collect in ONE pass: fetch at most bound+1 rows — a corpus
    // over the bound is detected from the extra row without a separate
    // count() that would execute the upstream lineage twice per fit
    val bound = math.min($(maxCollectRows), Int.MaxValue - 1L).toInt
    val rows = df.select(cols: _*).limit(bound + 1).collect()
    require(rows.length <= bound,
      s"KNN.fit would collect more than $bound corpus rows to the driver " +
        "(raise with setMaxCollectRows if the driver has headroom). " +
        "Exact KNN is driver-bounded by design — for larger corpora use " +
        "the distributed ANN operators " +
        "(graft.sim.LSHNearestNeighbors / IVFNearestNeighbors).")
    val points = rows.map(r => extractVec(r, 0))
    val ids = rows.map(_.getLong(1))
    val labels = if (hasLabels) rows.map(_.getInt(2)) else Array.empty[Int]
    val tree = new BallTree(points, ids, labels, $(leafSize))
    val m = new KNNModel(uid + "_model")
      .setInputCol(getInputCol).setOutputCol(getOutputCol).setK($(k))
    m.treeBroadcast = df.sparkSession.sparkContext.broadcast(tree)
    m
  }
  override def transformSchema(schema: StructType): StructType =
    KNNModel.outputSchema(schema, getOutputCol)
  override def copy(extra: ParamMap): KNN = defaultCopy(extra)
}
object KNN extends graft.core.GraftReadable[KNN]


class KNNModel(override val uid: String) extends Model[KNNModel]
    with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("KNNModel"))

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(KNNModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(KNNModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/tree.bin",
          treeBroadcast.value)
      }
    }

  final val k = new IntParam(this, "k", "neighbors")
  setDefault(k -> 5)
  def setK(v: Int): this.type = set(k, v)

  /** Optional column holding an array of allowed conditioner labels. */
  final val conditionerCol = new Param[String](this, "conditionerCol",
    "array<int> column of allowed labels per query row")
  def setConditionerCol(v: String): this.type = set(conditionerCol, v)

  var treeBroadcast: org.apache.spark.broadcast.Broadcast[BallTree] = _

  override def transform(ds: Dataset[_]): DataFrame = {
    val bc = treeBroadcast
    val kk = $(k)
    val searchUdf = udf((v: Seq[Double]) =>
      bc.value.search(v.toArray, kk).map { case (d, id) => (d, id) })
    val condUdf = udf((v: Seq[Double], allowed: Seq[Int]) =>
      bc.value.search(v.toArray, kk, allowed.toSet).map { case (d, id) => (d, id) })
    val df = ds.toDF()
    val inVec = df.schema(getInputCol).dataType match {
      case _: ArrayType => col(getInputCol).cast(ArrayType(DoubleType))
      case _ => // ml VectorUDT
        org.apache.spark.ml.functions.vector_to_array(col(getInputCol))
    }
    val out =
      if (isSet(conditionerCol)) condUdf(inVec, col($(conditionerCol)))
      else searchUdf(inVec)
    df.withColumn(getOutputCol,
      out.cast(ArrayType(StructType(Seq(
        StructField("distance", DoubleType), StructField("id", LongType))))))
  }
  override def transformSchema(schema: StructType): StructType =
    KNNModel.outputSchema(schema, getOutputCol)
  override def copy(extra: ParamMap): KNNModel = {
    val c = new KNNModel(uid); c.treeBroadcast = treeBroadcast
    copyValues(c, extra)
  }
}

object KNNModel extends org.apache.spark.ml.util.MLReadable[KNNModel] {
  override def read: org.apache.spark.ml.util.MLReader[KNNModel] =
    new org.apache.spark.ml.util.MLReader[KNNModel] {
      override def load(path: String): KNNModel = {
        val m = new KNNModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        val tree = graft.core.ModelIO
          .readObject[BallTree](sparkSession, s"$path/tree.bin")
        m.treeBroadcast = sparkSession.sparkContext.broadcast(tree)
        m
      }
    }

  private[nn] def outputSchema(schema: StructType, out: String): StructType =
    StructType(schema :+ StructField(out, ArrayType(StructType(Seq(
      StructField("distance", DoubleType), StructField("id", LongType))))))
}
