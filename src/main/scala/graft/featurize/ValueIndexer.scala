package graft.featurize

import graft.core._
import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.attribute.NominalAttribute
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Distinct values -> ordered levels -> metadata-tagged integer index column
  * (ref: featurize/ValueIndexer.scala:24-203; categorical-as-metadata per
  * core/.../schema/Categoricals.scala:41-65). Null maps to the last index,
  * like the reference's null-level-last convention.
  *
  * Scale: fit is one distinct aggregation (map-side combinable); transform
  * is a broadcast map literal lookup (`element_at(map, col)`) — codegen'd,
  * no shuffle, no UDF.
  */
class ValueIndexer(override val uid: String) extends Estimator[ValueIndexerModel]
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ValueIndexer"))

  override def fit(ds: Dataset[_]): ValueIndexerModel = {
    val df = ds.toDF()
    val distinctVals = df.select(col(getInputCol)).where(col(getInputCol).isNotNull)
      .distinct().collect().map(_.get(0))
    val levels: Array[String] = distinctVals.map(_.toString).sorted
    val m = new ValueIndexerModel(uid + "_model")
      .setInputCol(getInputCol).setOutputCol(getOutputCol)
    m.levels = levels
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, IntegerType, nullable = false))
  override def copy(extra: ParamMap): ValueIndexer = defaultCopy(extra)
}
object ValueIndexer extends graft.core.GraftReadable[ValueIndexer]


class ValueIndexerModel(override val uid: String) extends Model[ValueIndexerModel]
    with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("ValueIndexerModel"))

  /** Ordered levels; index of a value is its position, null -> levels.length. */
  var levels: Array[String] = Array.empty

  override def transform(ds: Dataset[_]): DataFrame = {
    val lookup = map(levels.zipWithIndex.flatMap {
      case (v, i) => Seq(lit(v), lit(i))
    }.toIndexedSeq: _*)
    val meta = NominalAttribute.defaultAttr
      .withName(getOutputCol).withValues(levels).toMetadata()
    val idx = when(col(getInputCol).isNull, lit(levels.length))
      .otherwise(element_at(lookup, col(getInputCol).cast("string")))
    ds.toDF().withColumn(getOutputCol, idx.as(getOutputCol, meta))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, IntegerType, nullable = false))
  override def copy(extra: ParamMap): ValueIndexerModel = {
    val c = new ValueIndexerModel(uid); c.levels = levels; copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(ValueIndexerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(ValueIndexerModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/levels.bin", levels)
      }
    }
}

object ValueIndexerModel extends org.apache.spark.ml.util.MLReadable[ValueIndexerModel] {
  override def read: org.apache.spark.ml.util.MLReader[ValueIndexerModel] =
    new org.apache.spark.ml.util.MLReader[ValueIndexerModel] {
      override def load(path: String): ValueIndexerModel = {
        val m = new ValueIndexerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.levels = graft.core.ModelIO
          .readObject[Array[String]](sparkSession, s"$path/levels.bin")
        m
      }
    }
}

/** Inverse of ValueIndexer: index column -> original value, reading the
  * level list from column metadata (ref: featurize/IndexToValue.scala:38-70).
  */
class IndexToValue(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("IndexToValue"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val meta = ds.schema(getInputCol).metadata
    val attr = org.apache.spark.ml.attribute.Attribute
      .fromStructField(ds.schema(getInputCol)).asInstanceOf[NominalAttribute]
    val values = attr.values.getOrElse(
      throw new IllegalArgumentException(
        s"IndexToValue: $getInputCol has no nominal metadata"))
    val arr = array(values.toIndexedSeq.map(lit): _*)
    ds.toDF().withColumn(getOutputCol, element_at(arr, col(getInputCol) + 1))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, StringType, nullable = true))
  override def copy(extra: ParamMap): IndexToValue = defaultCopy(extra)
}
object IndexToValue extends graft.core.GraftReadable[IndexToValue]

