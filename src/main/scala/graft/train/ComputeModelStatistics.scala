package graft.train

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.mllib.evaluation.{BinaryClassificationMetrics, MulticlassMetrics, RegressionMetrics}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Model evaluation as a stage (ref: train/ComputeModelStatistics
  * .scala:73-261): classification → accuracy/precision/recall/AUC,
  * regression → mse/rmse/r2/mae. Metrics come from the distributed
  * mllib evaluators (one pass + sort for AUC), emitted as a 1-row frame.
  */
class ComputeModelStatistics(override val uid: String) extends Transformer
    with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ComputeModelStatistics"))

  final val evaluationMetric = new Param[String](this, "evaluationMetric",
    "classification | regression",
    ParamValidators.inArray(Array("classification", "regression")))
  setDefault(evaluationMetric -> "classification")
  def setEvaluationMetric(v: String): this.type = set(evaluationMetric, v)
  final val scoresCol = new Param[String](this, "scoresCol",
    "prediction column")
  setDefault(scoresCol -> "prediction")
  def setScoresCol(v: String): this.type = set(scoresCol, v)
  final val scoredProbabilitiesCol = new Param[String](this,
    "scoredProbabilitiesCol", "probability vector column (binary AUC)")
  def setScoredProbabilitiesCol(v: String): this.type =
    set(scoredProbabilitiesCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    $(evaluationMetric) match {
      case "classification" =>
        // project + persist ONCE: the input is typically an unmaterialized
        // featurize+predict lineage, and the multiclass and AUC evaluators
        // would otherwise each recompute it from scratch
        val hasProb = isSet(scoredProbabilitiesCol)
        val projCols = Seq(
          col($(scoresCol)).cast("double").as("__p"),
          col(getLabelCol).cast("double").as("__l")) ++
          (if (hasProb)
            Seq(element_at(org.apache.spark.ml.functions.vector_to_array(
              col($(scoredProbabilitiesCol))), 2).as("__s"))
          else Nil)
        val proj = df.select(projCols: _*)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val mc = new MulticlassMetrics(
          proj.rdd.map(r => (r.getDouble(0), r.getDouble(1))))
        val auc =
          if (hasProb)
            new BinaryClassificationMetrics(
              proj.rdd.map(r => (r.getDouble(2), r.getDouble(1))))
              .areaUnderROC()
          else Double.NaN
        val out = spark.createDataFrame(java.util.List.of(
          Row(mc.accuracy, mc.weightedPrecision, mc.weightedRecall,
            mc.weightedFMeasure, auc)),
          StructType(Seq(
            StructField("accuracy", DoubleType),
            StructField("precision", DoubleType),
            StructField("recall", DoubleType),
            StructField("f1", DoubleType),
            StructField("AUC", DoubleType))))
        proj.unpersist(blocking = false) // metrics above are already materialized
        out
      case "regression" =>
        val pl = df.select(col($(scoresCol)).cast("double"),
          col(getLabelCol).cast("double")).rdd
          .map(r => (r.getDouble(0), r.getDouble(1)))
        val rm = new RegressionMetrics(pl)
        spark.createDataFrame(java.util.List.of(
          Row(rm.meanSquaredError, rm.rootMeanSquaredError,
            rm.r2, rm.meanAbsoluteError)),
          StructType(Seq(
            StructField("mse", DoubleType),
            StructField("rmse", DoubleType),
            StructField("r2", DoubleType),
            StructField("mae", DoubleType))))
    }
  }
  override def transformSchema(schema: StructType): StructType =
    $(evaluationMetric) match {
      case "classification" => StructType(Seq(
        StructField("accuracy", DoubleType), StructField("precision", DoubleType),
        StructField("recall", DoubleType), StructField("f1", DoubleType),
        StructField("AUC", DoubleType)))
      case _ => StructType(Seq(
        StructField("mse", DoubleType), StructField("rmse", DoubleType),
        StructField("r2", DoubleType), StructField("mae", DoubleType)))
    }
  override def copy(extra: ParamMap): ComputeModelStatistics = defaultCopy(extra)
}
object ComputeModelStatistics extends graft.core.GraftReadable[ComputeModelStatistics]


/** Per-row loss columns (ref: train/ComputePerInstanceStatistics.scala:1-114):
  * regression → per-row L1/L2 loss; classification → per-row log loss from
  * the probability vector. Pure column expressions — codegen'd.
  */
class ComputePerInstanceStatistics(override val uid: String) extends Transformer
    with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ComputePerInstanceStatistics"))

  final val evaluationMetric = new Param[String](this, "evaluationMetric",
    "classification | regression",
    ParamValidators.inArray(Array("classification", "regression")))
  setDefault(evaluationMetric -> "regression")
  def setEvaluationMetric(v: String): this.type = set(evaluationMetric, v)
  final val scoresCol = new Param[String](this, "scoresCol", "prediction col")
  setDefault(scoresCol -> "prediction")
  final val scoredProbabilitiesCol = new Param[String](this,
    "scoredProbabilitiesCol", "probability vector column")
  def setScoredProbabilitiesCol(v: String): this.type =
    set(scoredProbabilitiesCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    $(evaluationMetric) match {
      case "regression" =>
        val err = col($(scoresCol)).cast("double") - col(getLabelCol).cast("double")
        df.withColumn("L1_loss", abs(err)).withColumn("L2_loss", err * err)
      case "classification" =>
        val probs = org.apache.spark.ml.functions
          .vector_to_array(col($(scoredProbabilitiesCol)))
        df.withColumn("log_loss",
          -org.apache.spark.sql.functions.log(greatest(element_at(probs,
            col(getLabelCol).cast("int") + 1), lit(1e-15))))
    }
  }
  override def transformSchema(schema: StructType): StructType =
    $(evaluationMetric) match {
      case "regression" => StructType(schema ++ Seq(
        StructField("L1_loss", DoubleType), StructField("L2_loss", DoubleType)))
      case _ => StructType(schema :+ StructField("log_loss", DoubleType))
    }
  override def copy(extra: ParamMap): ComputePerInstanceStatistics =
    defaultCopy(extra)
}
object ComputePerInstanceStatistics extends graft.core.GraftReadable[ComputePerInstanceStatistics]

