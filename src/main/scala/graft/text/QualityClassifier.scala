package graft.text

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.classification.{LogisticRegression, LogisticRegressionModel}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** FastText-shaped quality classifier for corpus filtering — the GPT-3 /
  * LLaMA data-recipe stage: train a linear classifier to distinguish a
  * curated reference corpus (label 1) from raw crawl (label 0), score
  * every crawl document, keep high-scoring ones (optionally with the
  * GPT-3 Appendix-A Pareto rule, [[QualityClassifier.paretoKeep]]).
  * (Joulin et al. 2016's fastText = hashed bag of words+bigrams into a
  * linear model — here the [[graft.featurize.VowpalHashFeaturizer]]
  * murmur-hashed space feeding Spark ML logistic regression.)
  *
  * Scale shape: featurization is a narrow per-row map into a 2^numBits
  * sparse space (no vocabulary pass, no fit state of its own); training
  * is Spark ML L-BFGS over the hashed features; scoring is one narrow
  * pass. Nothing collects to the driver beyond the coefficient vector
  * (2^numBits doubles — bound numBits accordingly).
  */
class QualityClassifier(override val uid: String)
    extends Estimator[QualityClassifierModel] with HasInputCol
    with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("QualityClassifier"))

  final val numBits = new IntParam(this, "numBits", "log2 feature space",
    ParamValidators.inRange(1, 26))
  setDefault(numBits -> 20)
  def setNumBits(v: Int): this.type = set(numBits, v)
  final val useBigrams = new BooleanParam(this, "useBigrams",
    "hash word bigrams alongside unigrams (the fastText default)")
  setDefault(useBigrams -> true)
  def setUseBigrams(v: Boolean): this.type = set(useBigrams, v)
  final val maxIter = new IntParam(this, "maxIter",
    "L-BFGS iteration cap", ParamValidators.gt(0))
  setDefault(maxIter -> 50)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  final val regParam = new DoubleParam(this, "regParam",
    "L2 regularization", ParamValidators.gtEq(0.0))
  setDefault(regParam -> 1e-4)
  def setRegParam(v: Double): this.type = set(regParam, v)

  override def fit(ds: Dataset[_]): QualityClassifierModel = {
    val prepped = QualityClassifierModel
      .featurize(ds.toDF(), getInputCol, $(numBits), $(useBigrams))
    val lr = new LogisticRegression().setFeaturesCol("__qc_features")
      .setLabelCol($(labelCol)).setMaxIter($(maxIter))
      .setRegParam($(regParam)).setStandardization(false)
    val m = new QualityClassifierModel(uid + "_model")
      .setInputCol(getInputCol)
    m.set(m.numBits, $(numBits)).set(m.useBigrams, $(useBigrams))
    m.lrModel = lr.fit(prepped)
    m
  }
  override def transformSchema(schema: StructType): StructType =
    QualityClassifierModel.outputSchema(schema)
  override def copy(extra: ParamMap): QualityClassifier = defaultCopy(extra)
}

object QualityClassifier extends graft.core.GraftReadable[QualityClassifier] {
  /** GPT-3 Appendix-A keep rule, made deterministic: keep a document iff
    * `pareto(alpha) > 1 - score`, with the Pareto draw derived from
    * md5(id:salt) by inverse CDF (x = u^(-1/alpha) - 1, u uniform on the
    * hash's first 8 hex digits). High-scoring docs always survive;
    * low-scoring ones survive occasionally, preserving tail diversity —
    * and the same (id, salt) always decides the same way, so reruns are
    * reproducible (the DomainMixtureSampler determinism convention).
    */
  def paretoKeep(scoreCol: Column, idCol: Column, alpha: Double,
      salt: String): Column = {
    val u = conv(substring(md5(concat(idCol.cast(StringType),
      lit(":" + salt))), 1, 8), 16, 10).cast("double") / 4294967296.0
    // Lomax inverse CDF on 1-u: u=0 -> draw = 0, the distribution's
    // minimum (a doc whose md5 prefix is 00000000 survives only on
    // score > 1); the draw grows without bound as u -> 1, but u <=
    // 0xffffffff/2^32 < 1 by construction, so infinity never arises
    pow(lit(1.0) - u, lit(-1.0 / alpha)) - lit(1.0) > lit(1.0) - scoreCol
  }
}

class QualityClassifierModel(override val uid: String)
    extends Model[QualityClassifierModel] with HasInputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("QualityClassifierModel"))

  final val numBits = new IntParam(this, "numBits", "log2 feature space",
    ParamValidators.inRange(1, 26))
  setDefault(numBits -> 20)
  final val useBigrams = new BooleanParam(this, "useBigrams",
    "hash word bigrams alongside unigrams")
  setDefault(useBigrams -> true)

  var lrModel: LogisticRegressionModel = _

  override def transform(ds: Dataset[_]): DataFrame = {
    val prepped = QualityClassifierModel
      .featurize(ds.toDF(), getInputCol, $(numBits), $(useBigrams))
    val p1 = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    lrModel.setFeaturesCol("__qc_features")
      .setProbabilityCol("__qc_probability")
      .setPredictionCol("__qc_prediction")
      .setRawPredictionCol("__qc_raw")
      .transform(prepped)
      .withColumn("quality_prob", p1(col("__qc_probability")))
      .withColumn("quality_pred", col("__qc_prediction").cast("long"))
      .drop("__qc_features", "__qc_probability", "__qc_prediction",
        "__qc_raw", "__qc_toks", "__qc_bi")
  }
  override def transformSchema(schema: StructType): StructType =
    QualityClassifierModel.outputSchema(schema)
  override def copy(extra: ParamMap): QualityClassifierModel = {
    val c = new QualityClassifierModel(uid)
    c.lrModel = lrModel
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(QualityClassifierModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(QualityClassifierModel.this))
        lrModel.write.overwrite().save(s"$path/lr")
      }
    }
}

object QualityClassifierModel
    extends org.apache.spark.ml.util.MLReadable[QualityClassifierModel] {
  /** Shared featurization: canonical tokens (+ bigrams) murmur-hashed
    * into a sparse 2^numBits vector — stateless, narrow. */
  private[text] def featurize(df: DataFrame, inputCol: String,
      bits: Int, bigrams: Boolean): DataFrame = {
    val toks = df.withColumn("__qc_toks", UnigramLM.tokens(col(inputCol)))
    val withGrams =
      if (bigrams) toks.withColumn("__qc_bi",
        PipelineFunctions.wordNGrams(col("__qc_toks"), 2))
      else toks
    val inCols = if (bigrams) Seq("__qc_toks", "__qc_bi") else Seq("__qc_toks")
    new graft.featurize.VowpalHashFeaturizer()
      .setInputCols(inCols).setOutputCol("__qc_features").setNumBits(bits)
      .transform(withGrams)
  }

  private[text] def outputSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("quality_prob", DoubleType),
      StructField("quality_pred", LongType)))

  override def read: org.apache.spark.ml.util.MLReader[QualityClassifierModel] =
    new org.apache.spark.ml.util.MLReader[QualityClassifierModel] {
      override def load(path: String): QualityClassifierModel = {
        val m = new QualityClassifierModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.lrModel = LogisticRegressionModel.load(s"$path/lr")
        m
      }
    }
}
