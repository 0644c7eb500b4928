package graft.stages

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.ml.param._
import org.apache.spark.ml.stat.Summarizer
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Group by key columns and average numeric columns; Vector columns get
  * element-wise mean via `Summarizer.mean`; optionally re-join the grouped
  * result onto the original rows when `collapseGroup=false`
  * (ref: core/.../stages/EnsembleByKey.scala:81-125).
  *
  * One shuffle on the keys; partial aggregation is map-side combinable for
  * the numeric means and for Summarizer's vector mean buffer.
  */
class EnsembleByKey(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("EnsembleByKey"))

  final val keys = new StringArrayParam(this, "keys", "grouping key columns")
  def setKeys(v: Seq[String]): this.type = set(keys, v.toArray)
  final val cols = new StringArrayParam(this, "cols", "columns to average")
  def setCols(v: Seq[String]): this.type = set(cols, v.toArray)
  final val colNames = new StringArrayParam(this, "colNames",
    "output names, parallel to cols")
  def setColNames(v: Seq[String]): this.type = set(colNames, v.toArray)
  final val strategy = new Param[String](this, "strategy", "only 'mean'",
    ParamValidators.inArray(Array("mean")))
  setDefault(strategy -> "mean")
  final val collapseGroup = new BooleanParam(this, "collapseGroup",
    "if true emit one row per key; else re-join onto original rows")
  setDefault(collapseGroup -> true)
  def setCollapseGroup(v: Boolean): this.type = set(collapseGroup, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    val df = ds.toDF()
    val outNames = if (isSet(colNames)) $(colNames)
      else $(cols).map(c => s"mean_$c")
    val aggs = $(cols).zip(outNames).map { case (c, out) =>
      df.schema(c).dataType match {
        case SQLDataTypes.VectorType => Summarizer.mean(col(c)).as(out)
        // order-independent mean (see graft.core.Determinism)
        case _: NumericType =>
          graft.core.Determinism.deterministicMean(col(c)).as(out)
        case other => throw new IllegalArgumentException(
          s"EnsembleByKey: unsupported type $other for $c")
      }
    }
    val grouped = df.groupBy($(keys).toIndexedSeq.map(col): _*)
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
    if ($(collapseGroup)) grouped
    else df.join(grouped, $(keys).toIndexedSeq, "left")
  }

  override def transformSchema(schema: StructType): StructType = {
    val outNames = if (isSet(colNames)) $(colNames)
      else $(cols).map(c => s"mean_$c")
    require(outNames.length == $(cols).length,
      "EnsembleByKey: colNames must be parallel to cols")
    val outFields = $(cols).zip(outNames).map { case (c, out) =>
      schema(c).dataType match {
        case SQLDataTypes.VectorType => StructField(out, SQLDataTypes.VectorType)
        case _: NumericType => StructField(out, DoubleType)
        case other => throw new IllegalArgumentException(
          s"EnsembleByKey: unsupported type $other for $c")
      }
    }
    if ($(collapseGroup))
      StructType($(keys).map(schema(_)) ++ outFields)
    else StructType(schema ++ outFields)
  }
  override def copy(extra: ParamMap): EnsembleByKey = defaultCopy(extra)
}
object EnsembleByKey extends graft.core.GraftReadable[EnsembleByKey]

