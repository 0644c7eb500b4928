package graft.train

import graft.core._
import graft.featurize.{Featurize, FeaturizeModel, ValueIndexer, ValueIndexerModel}
import org.apache.spark.ml.{Estimator, Model, PredictionModel, Predictor}
import org.apache.spark.ml.classification._
import org.apache.spark.ml.param._
import org.apache.spark.ml.regression._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Auto-featurizing classification trainer: reindex label + Featurize +
  * learner → one model (ref: train/TrainClassifier.scala:95-181).
  * LightGBM/VW native learners are substituted by Spark ML GBT/LR per the
  * survey's build-or-buy call (SURVEY §2.13).
  */
class TrainClassifier(override val uid: String)
    extends Estimator[TrainedClassifierModel] with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TrainClassifier"))

  final val featureCols = new StringArrayParam(this, "featureCols",
    "input feature columns")
  def setFeatureCols(v: Seq[String]): this.type = set(featureCols, v.toArray)
  final val learner = new Param[String](this, "learner",
    "LogisticRegression | RandomForest | GBT | DecisionTree",
    ParamValidators.inArray(Array(
      "LogisticRegression", "RandomForest", "GBT", "DecisionTree")))
  setDefault(learner -> "LogisticRegression")
  def setLearner(v: String): this.type = set(learner, v)
  final val numFeatures = new IntParam(this, "numFeatures", "text hash bits")
  setDefault(numFeatures -> (1 << 16))
  def setNumFeatures(v: Int): this.type = set(numFeatures, v)
  final val maxIter = new IntParam(this, "maxIter",
    "iteration cap for iterative learners (LR)", ParamValidators.gt(0))
  setDefault(maxIter -> 100)
  def setMaxIter(v: Int): this.type = set(maxIter, v)

  override def fit(ds: Dataset[_]): TrainedClassifierModel = {
    // cache the cleaned input: the indexer fit, featurizer fit, and the
    // featurized-transform scan below would otherwise each re-read source
    val df = ds.toDF().na.drop(Seq(getLabelCol)).cache()
    // 1. label -> contiguous indices (metadata-tagged)
    val indexer = new ValueIndexer().setInputCol(getLabelCol)
      .setOutputCol("__label").fit(df)
    val indexed = indexer.transform(df)
    // 2. auto-featurize
    val feats = if (isSet(featureCols)) $(featureCols).toSeq
      else df.columns.filterNot(_ == getLabelCol).toSeq
    val featurizer = new Featurize().setInputCols(feats)
      .setOutputCol("__features").setNumFeatures($(numFeatures)).fit(indexed)
    val prepared = featurizer.transform(indexed).cache()
    // 3. learner
    val est = $(learner) match {
      case "LogisticRegression" => new LogisticRegression().setMaxIter($(maxIter))
      case "RandomForest" => new RandomForestClassifier()
      case "GBT" => new GBTClassifier()
      case "DecisionTree" => new DecisionTreeClassifier()
    }
    est.setLabelCol("__label").setFeaturesCol("__features")
    val fitted = est.fit(prepared)
    prepared.unpersist()
    df.unpersist(blocking = false)
    val m = new TrainedClassifierModel(uid + "_model")
    m.indexer = indexer; m.featurizer = featurizer
    m.inner = fitted.asInstanceOf[PredictionModel[_, _]]
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("prediction", DoubleType),
      StructField("predicted_label", StringType)))
  override def copy(extra: ParamMap): TrainClassifier = defaultCopy(extra)
}
object TrainClassifier extends graft.core.GraftReadable[TrainClassifier]


class TrainedClassifierModel(override val uid: String)
    extends Model[TrainedClassifierModel]
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("TrainedClassifierModel"))

  var indexer: ValueIndexerModel = _
  var featurizer: FeaturizeModel = _
  var inner: PredictionModel[_, _] = _

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(TrainedClassifierModel.this, path, sparkSession)
        indexer.write.overwrite().save(s"$path/indexer")
        featurizer.write.overwrite().save(s"$path/featurizer")
        inner.asInstanceOf[org.apache.spark.ml.util.MLWritable]
          .write.overwrite().save(s"$path/inner")
        graft.core.ModelIO.writeText(sparkSession, s"$path/innerClass.txt",
          inner.getClass.getName)
      }
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val featurized = featurizer.transform(ds.toDF())
    val scored = inner.transform(featurized)
    val levels = indexer.levels
    val arr = array(levels.toIndexedSeq.map(lit): _*)
    scored
      .withColumn("predicted_label",
        element_at(arr, col("prediction").cast("int") + 1))
      .drop("__features")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("prediction", DoubleType),
      StructField("predicted_label", StringType)))
  override def copy(extra: ParamMap): TrainedClassifierModel = {
    val c = new TrainedClassifierModel(uid)
    c.indexer = indexer; c.featurizer = featurizer; c.inner = inner
    copyValues(c, extra)
  }
}

object TrainedClassifierModel
    extends org.apache.spark.ml.util.MLReadable[TrainedClassifierModel] {

  /** Reload any MLReadable Spark model via its companion's load(path). */
  private[train] def loadInner(className: String, path: String): PredictionModel[_, _] = {
    val companion = Class.forName(className + "$")
    val module = companion.getField("MODULE$").get(null)
    companion.getMethod("load", classOf[String])
      .invoke(module, path).asInstanceOf[PredictionModel[_, _]]
  }

  override def read: org.apache.spark.ml.util.MLReader[TrainedClassifierModel] =
    new org.apache.spark.ml.util.MLReader[TrainedClassifierModel] {
      override def load(path: String): TrainedClassifierModel = {
        val m = new TrainedClassifierModel()
        m.indexer = ValueIndexerModel.load(s"$path/indexer")
        m.featurizer = FeaturizeModel.load(s"$path/featurizer")
        m.inner = loadInner(graft.core.ModelIO
          .readText(sparkSession, s"$path/innerClass.txt").trim, s"$path/inner")
        m
      }
    }
}

/** Auto-featurizing regression trainer (ref: train/TrainRegressor.scala). */
class TrainRegressor(override val uid: String)
    extends Estimator[TrainedRegressorModel] with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TrainRegressor"))

  final val featureCols = new StringArrayParam(this, "featureCols", "")
  def setFeatureCols(v: Seq[String]): this.type = set(featureCols, v.toArray)
  final val learner = new Param[String](this, "learner",
    "LinearRegression | RandomForest | GBT | DecisionTree",
    ParamValidators.inArray(Array(
      "LinearRegression", "RandomForest", "GBT", "DecisionTree")))
  setDefault(learner -> "LinearRegression")
  def setLearner(v: String): this.type = set(learner, v)

  override def fit(ds: Dataset[_]): TrainedRegressorModel = {
    val df = ds.toDF().na.drop(Seq(getLabelCol)).cache()
    val feats = if (isSet(featureCols)) $(featureCols).toSeq
      else df.columns.filterNot(_ == getLabelCol).toSeq
    val featurizer = new Featurize().setInputCols(feats)
      .setOutputCol("__features").fit(df)
    val prepared = featurizer.transform(df)
      .withColumn("__label", col(getLabelCol).cast("double")).cache()
    val est = $(learner) match {
      case "LinearRegression" => new LinearRegression()
      case "RandomForest" => new RandomForestRegressor()
      case "GBT" => new GBTRegressor()
      case "DecisionTree" => new DecisionTreeRegressor()
    }
    est.setLabelCol("__label").setFeaturesCol("__features")
    val fitted = est.fit(prepared)
    prepared.unpersist()
    df.unpersist(blocking = false)
    val m = new TrainedRegressorModel(uid + "_model")
    m.featurizer = featurizer
    m.inner = fitted.asInstanceOf[PredictionModel[_, _]]
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField("prediction", DoubleType))
  override def copy(extra: ParamMap): TrainRegressor = defaultCopy(extra)
}
object TrainRegressor extends graft.core.GraftReadable[TrainRegressor]


class TrainedRegressorModel(override val uid: String)
    extends Model[TrainedRegressorModel]
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("TrainedRegressorModel"))

  var featurizer: FeaturizeModel = _
  var inner: PredictionModel[_, _] = _

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(TrainedRegressorModel.this, path, sparkSession)
        featurizer.write.overwrite().save(s"$path/featurizer")
        inner.asInstanceOf[org.apache.spark.ml.util.MLWritable]
          .write.overwrite().save(s"$path/inner")
        graft.core.ModelIO.writeText(sparkSession, s"$path/innerClass.txt",
          inner.getClass.getName)
      }
    }

  override def transform(ds: Dataset[_]): DataFrame =
    inner.transform(featurizer.transform(ds.toDF())).drop("__features")
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField("prediction", DoubleType))
  override def copy(extra: ParamMap): TrainedRegressorModel = {
    val c = new TrainedRegressorModel(uid)
    c.featurizer = featurizer; c.inner = inner
    copyValues(c, extra)
  }
}

object TrainedRegressorModel
    extends org.apache.spark.ml.util.MLReadable[TrainedRegressorModel] {
  override def read: org.apache.spark.ml.util.MLReader[TrainedRegressorModel] =
    new org.apache.spark.ml.util.MLReader[TrainedRegressorModel] {
      override def load(path: String): TrainedRegressorModel = {
        val m = new TrainedRegressorModel()
        m.featurizer = FeaturizeModel.load(s"$path/featurizer")
        m.inner = TrainedClassifierModel.loadInner(graft.core.ModelIO
          .readText(sparkSession, s"$path/innerClass.txt").trim, s"$path/inner")
        m
      }
    }
}
