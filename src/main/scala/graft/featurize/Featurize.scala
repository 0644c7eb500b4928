package graft.featurize

import graft.core._
import org.apache.spark.ml.{Estimator, Model, Pipeline, PipelineModel, PipelineStage}
import org.apache.spark.ml.feature._
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Automatic featurization: per-type sub-pipelines feeding one
  * VectorAssembler (ref: featurize/Featurize.scala:121-229):
  *  - numeric → cast double + mean imputation;
  *  - string (low cardinality unknown) → tokenizer + HashingTF [+ IDF];
  *  - boolean → cast double;
  *  - date → [epochMs, year, isoDayofweek, month, day] vector;
  *    timestamp → the same plus [hour, minute, second] — the exact
  *    component set, order, epoch unit (milliseconds) and ISO Mon=1
  *    day-of-week of the reference (featurize/Featurize.scala:188-213,
  *    which uses ts.getTime + java.time getDayOfWeek.getValue), built
  *    from native expressions instead of its UDF (SURVEY §2.8 note; the
  *    featurize_datetime / featurize_timestamp driver gates check each
  *    component against DuckDB date parts);
  *  - vector → passthrough.
  */
class Featurize(override val uid: String) extends Estimator[FeaturizeModel]
    with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("Featurize"))
  setDefault(outputCol -> "features")

  final val inputCols = new StringArrayParam(this, "inputCols", "feature columns")
  def setInputCols(v: Seq[String]): this.type = set(inputCols, v.toArray)
  final val numFeatures = new IntParam(this, "numFeatures", "text hash buckets")
  setDefault(numFeatures -> (1 << 16))
  def setNumFeatures(v: Int): this.type = set(numFeatures, v)

  override def fit(ds: Dataset[_]): FeaturizeModel = {
    val df = ds.toDF()
    val stages = scala.collection.mutable.ArrayBuffer.empty[PipelineStage]
    val assembled = scala.collection.mutable.ArrayBuffer.empty[String]
    var pre: DataFrame => DataFrame = identity
    val preExprs = scala.collection.mutable.ArrayBuffer.empty[(String, org.apache.spark.sql.Column)]

    $(inputCols).foreach { c =>
      val t = df.schema(c).dataType
      val tmp = s"__f_$c"
      t match {
        case _: NumericType =>
          preExprs += tmp -> col(c).cast("double")
          stages += new Imputer().setInputCol(tmp).setOutputCol(tmp + "_i")
            .setStrategy("mean")
          assembled += tmp + "_i"
        case BooleanType =>
          preExprs += tmp -> col(c).cast("double")
          assembled += tmp
        case StringType =>
          // the reference null-fills strings before tokenizing
          // (featurize/Featurize.scala:181 na.fill) — without it a null
          // row poisons the assembled vector
          preExprs += (tmp + "_nn") -> coalesce(col(c), lit(""))
          stages += new RegexTokenizer().setInputCol(tmp + "_nn")
            .setOutputCol(tmp + "_t")
            .setPattern("\\s+").setToLowercase(true)
          stages += new HashingTF().setInputCol(tmp + "_t")
            .setOutputCol(tmp + "_h").setNumFeatures($(numFeatures))
          assembled += tmp + "_h"
        case TimestampType | TimestampNTZType | DateType =>
          // epoch in ms (ref uses java.sql getTime, which floors sub-ms);
          // floor(micros/1000) is exact for |micros| < 2^53 (~year 2255)
          // since an exact-multiple quotient is itself representable.
          // ISO dow: Spark dayofweek is Sun=1, the ref is Mon=1..Sun=7
          preExprs += (tmp + "_epoch") ->
            floor(unix_micros(col(c).cast("timestamp")) / lit(1000L)).cast("double")
          preExprs += (tmp + "_year") -> year(col(c)).cast("double")
          preExprs += (tmp + "_dow") ->
            (((dayofweek(col(c)) + lit(5)) % lit(7)) + lit(1)).cast("double")
          preExprs += (tmp + "_month") -> month(col(c)).cast("double")
          preExprs += (tmp + "_day") -> dayofmonth(col(c)).cast("double")
          assembled ++= Seq(tmp + "_epoch", tmp + "_year", tmp + "_dow",
            tmp + "_month", tmp + "_day")
          if (t != DateType) {
            preExprs += (tmp + "_hour") -> hour(col(c)).cast("double")
            preExprs += (tmp + "_min") -> minute(col(c)).cast("double")
            preExprs += (tmp + "_sec") -> second(col(c)).cast("double")
            assembled ++= Seq(tmp + "_hour", tmp + "_min", tmp + "_sec")
          }
        case org.apache.spark.ml.linalg.SQLDataTypes.VectorType =>
          assembled += c
        case other => throw new IllegalArgumentException(
          s"Featurize: unsupported type $other for column $c")
      }
    }
    pre = d => preExprs.foldLeft(d) { case (cur, (name, e)) => cur.withColumn(name, e) }
    stages += new VectorAssembler().setInputCols(assembled.toArray)
      .setOutputCol(getOutputCol).setHandleInvalid("keep")
    val fitted = new Pipeline().setStages(stages.toArray).fit(pre(df))
    val m = new FeaturizeModel(uid + "_model").setOutputCol(getOutputCol)
    m.preExprs = preExprs.toSeq.map { case (n, e) => (n, e) }
    m.pipeline = fitted
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): Featurize = defaultCopy(extra)
}
object Featurize extends graft.core.GraftReadable[Featurize]


class FeaturizeModel(override val uid: String) extends Model[FeaturizeModel]
    with HasOutputCol with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("FeaturizeModel"))

  var preExprs: Seq[(String, org.apache.spark.sql.Column)] = Nil
  var pipeline: PipelineModel = _

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(FeaturizeModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(FeaturizeModel.this))
        // Column itself is not Serializable; its Catalyst Expression is
        graft.core.ModelIO.writeObject(sparkSession, s"$path/preExprs.bin",
          preExprs.map { case (n, c) =>
            (n, org.apache.spark.sql.graftshims.ColumnBridge.expression(c))
          })
        pipeline.write.overwrite().save(s"$path/pipeline")
      }
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val pre = preExprs.foldLeft(ds.toDF()) {
      case (cur, (name, e)) => cur.withColumn(name, e)
    }
    val out = pipeline.transform(pre)
    out.drop(out.columns.filter(_.startsWith("__f_")).toIndexedSeq: _*)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): FeaturizeModel = {
    val c = new FeaturizeModel(uid)
    c.preExprs = preExprs; c.pipeline = pipeline
    copyValues(c, extra)
  }
}

object FeaturizeModel extends org.apache.spark.ml.util.MLReadable[FeaturizeModel] {
  override def read: org.apache.spark.ml.util.MLReader[FeaturizeModel] =
    new org.apache.spark.ml.util.MLReader[FeaturizeModel] {
      override def load(path: String): FeaturizeModel = {
        val m = new FeaturizeModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.preExprs = graft.core.ModelIO
          .readObject[Seq[(String,
            org.apache.spark.sql.catalyst.expressions.Expression)]](
            sparkSession, s"$path/preExprs.bin")
          .map { case (n, e) =>
            (n, org.apache.spark.sql.graftshims.ColumnBridge.column(e))
          }
        m.pipeline = PipelineModel.load(s"$path/pipeline")
        m
      }
    }
}
