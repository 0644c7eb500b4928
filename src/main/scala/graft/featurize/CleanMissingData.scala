package graft.featurize

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Replace missing values per column by mean / approx median / custom value
  * (ref: featurize/CleanMissingData.scala:111-175). Fit runs ONE aggregation
  * over all columns (avg or percentile_approx in a single wide agg);
  * transform is a `na.fill` — no shuffle, fully codegen'd.
  */
class CleanMissingData(override val uid: String) extends Estimator[CleanMissingDataModel]
    with HasInputCols with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("CleanMissingData"))

  final val cleaningMode = new Param[String](this, "cleaningMode",
    "Mean | Median | Custom",
    ParamValidators.inArray(Array("Mean", "Median", "Custom")))
  setDefault(cleaningMode -> "Mean")
  def setCleaningMode(v: String): this.type = set(cleaningMode, v)
  final val customValue = new DoubleParam(this, "customValue",
    "fill value for Custom mode")
  def setCustomValue(v: Double): this.type = set(customValue, v)

  override def fit(ds: Dataset[_]): CleanMissingDataModel = {
    transformSchema(ds.schema)
    val df = ds.toDF()
    val fills: Map[String, Double] = $(cleaningMode) match {
      case "Custom" => getInputCols.map(_ -> $(customValue)).toMap
      case mode =>
        val aggs = getInputCols.map { c =>
          if (mode == "Mean")
            graft.core.Determinism.deterministicMean(col(c)).as(c)
          else percentile_approx(col(c), lit(0.5), lit(1000000)).cast("double").as(c)
        }
        val row = df.agg(aggs.head, aggs.tail.toIndexedSeq: _*).head()
        getInputCols.zipWithIndex.collect {
          case (c, i) if !row.isNullAt(i) => c -> row.getDouble(i)
        }.toMap
    }
    val m = new CleanMissingDataModel(uid + "_model").setInputCols(getInputCols.toSeq)
    m.fillValues = fills
    m
  }
  override def transformSchema(schema: StructType): StructType = {
    SchemaChecks.requireCols(schema,
      getInputCols.toIndexedSeq.map("inputCols entry" -> _): _*)
    schema
  }
  override def copy(extra: ParamMap): CleanMissingData = defaultCopy(extra)
}
object CleanMissingData extends graft.core.GraftReadable[CleanMissingData]


class CleanMissingDataModel(override val uid: String)
    extends Model[CleanMissingDataModel] with HasInputCols
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("CleanMissingDataModel"))

  var fillValues: Map[String, Double] = Map.empty

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    ds.toDF().na.fill(fillValues)
  }
  override def transformSchema(schema: StructType): StructType = {
    // na.fill silently skips unknown names — validate so a misnamed
    // inputCols surfaces instead of a silent no-op fill
    SchemaChecks.requireCols(schema,
      getInputCols.toIndexedSeq.map("inputCols entry" -> _): _*)
    schema
  }
  override def copy(extra: ParamMap): CleanMissingDataModel = {
    val c = new CleanMissingDataModel(uid); c.fillValues = fillValues
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(CleanMissingDataModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(CleanMissingDataModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/fill.bin", fillValues)
      }
    }
}

object CleanMissingDataModel
    extends org.apache.spark.ml.util.MLReadable[CleanMissingDataModel] {
  override def read: org.apache.spark.ml.util.MLReader[CleanMissingDataModel] =
    new org.apache.spark.ml.util.MLReader[CleanMissingDataModel] {
      override def load(path: String): CleanMissingDataModel = {
        val m = new CleanMissingDataModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.fillValues = graft.core.ModelIO
          .readObject[Map[String, Double]](sparkSession, s"$path/fill.bin")
        m
      }
    }
}
