package graft.featurize

import graft.core._
import org.apache.spark.ml.{Estimator, Model, Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types._

/** Text → TF-IDF feature vector via the classic chain
  * RegexTokenizer → StopWordsRemover → NGram → HashingTF → IDF, each stage
  * optional (ref: featurize/text/TextFeaturizer.scala:285-348). All stages
  * are Spark ML built-ins — narrow ops except IDF's one aggregation.
  */
class TextFeaturizer(override val uid: String)
    extends Estimator[TextFeaturizerModel] with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TextFeaturizer"))
  setDefault(outputCol -> "features")

  final val useTokenizer = new BooleanParam(this, "useTokenizer", "")
  final val useStopWordsRemover = new BooleanParam(this, "useStopWordsRemover", "")
  final val useNGram = new BooleanParam(this, "useNGram", "")
  final val useIDF = new BooleanParam(this, "useIDF", "")
  final val nGramLength = new IntParam(this, "nGramLength", "")
  final val numFeatures = new IntParam(this, "numFeatures", "hash buckets",
    ParamValidators.gt(0))
  final val minDocFreq = new IntParam(this, "minDocFreq", "IDF min doc freq")
  final val tokenizerPattern = new Param[String](this, "tokenizerPattern", "")
  setDefault(useTokenizer -> true, useStopWordsRemover -> false,
    useNGram -> false, useIDF -> true, nGramLength -> 2,
    numFeatures -> (1 << 18), minDocFreq -> 1, tokenizerPattern -> "\\s+")
  def setUseTokenizer(v: Boolean): this.type = set(useTokenizer, v)
  def setUseStopWordsRemover(v: Boolean): this.type = set(useStopWordsRemover, v)
  def setUseNGram(v: Boolean): this.type = set(useNGram, v)
  def setUseIDF(v: Boolean): this.type = set(useIDF, v)
  def setNGramLength(v: Int): this.type = set(nGramLength, v)
  def setNumFeatures(v: Int): this.type = set(numFeatures, v)
  def setMinDocFreq(v: Int): this.type = set(minDocFreq, v)

  override def fit(ds: Dataset[_]): TextFeaturizerModel = {
    val stages = scala.collection.mutable.ArrayBuffer.empty[PipelineStage]
    var cur = getInputCol
    def temp(s: String) = s"__tf_${s}"
    if ($(useTokenizer)) {
      stages += new RegexTokenizer().setInputCol(cur).setOutputCol(temp("tok"))
        .setPattern($(tokenizerPattern)).setToLowercase(true)
      cur = temp("tok")
    }
    if ($(useStopWordsRemover)) {
      stages += new StopWordsRemover().setInputCol(cur).setOutputCol(temp("stop"))
      cur = temp("stop")
    }
    if ($(useNGram)) {
      stages += new NGram().setInputCol(cur).setOutputCol(temp("ngram"))
        .setN($(nGramLength))
      cur = temp("ngram")
    }
    val tfOut = if ($(useIDF)) temp("tf") else getOutputCol
    stages += new HashingTF().setInputCol(cur).setOutputCol(tfOut)
      .setNumFeatures($(numFeatures))
    if ($(useIDF))
      stages += new IDF().setInputCol(tfOut).setOutputCol(getOutputCol)
        .setMinDocFreq($(minDocFreq))
    val pipeline = new Pipeline().setStages(stages.toArray).fit(ds.toDF())
    val m = new TextFeaturizerModel(uid + "_model")
      .setInputCol(getInputCol).setOutputCol(getOutputCol)
    m.pipeline = pipeline
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): TextFeaturizer = defaultCopy(extra)
}
object TextFeaturizer extends graft.core.GraftReadable[TextFeaturizer]


class TextFeaturizerModel(override val uid: String)
    extends Model[TextFeaturizerModel] with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("TextFeaturizerModel"))

  var pipeline: PipelineModel = _

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(TextFeaturizerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(TextFeaturizerModel.this))
        pipeline.write.overwrite().save(s"$path/pipeline")
      }
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val out = pipeline.transform(ds.toDF())
    out.drop(out.columns.filter(_.startsWith("__tf_")).toIndexedSeq: _*)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): TextFeaturizerModel = {
    val c = new TextFeaturizerModel(uid); c.pipeline = pipeline
    copyValues(c, extra)
  }
}

object TextFeaturizerModel
    extends org.apache.spark.ml.util.MLReadable[TextFeaturizerModel] {
  override def read: org.apache.spark.ml.util.MLReader[TextFeaturizerModel] =
    new org.apache.spark.ml.util.MLReader[TextFeaturizerModel] {
      override def load(path: String): TextFeaturizerModel = {
        val m = new TextFeaturizerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.pipeline = PipelineModel.load(s"$path/pipeline")
        m
      }
    }
}
