package graft.stages

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Keep the listed columns, validating existence
  * (ref: core/.../stages/SelectColumns.scala:41-52).
  * Pure projection — Catalyst prunes the scan down to these columns.
  */
class SelectColumns(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("SelectColumns"))

  final val cols = new StringArrayParam(this, "cols", "columns to keep")
  def getCols: Array[String] = $(cols)
  def setCols(v: Seq[String]): this.type = set(cols, v.toArray)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    ds.toDF().select(getCols.map(col).toIndexedSeq: _*)
  }
  override def transformSchema(schema: StructType): StructType = {
    val missing = getCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"SelectColumns: missing ${missing.mkString(", ")}")
    StructType(getCols.map(schema(_)))
  }
  override def copy(extra: ParamMap): SelectColumns = defaultCopy(extra)
}
object SelectColumns extends DefaultParamsReadable[SelectColumns]

/** Drop the listed columns (ref: core/.../stages/DropColumns.scala:39-50). */
class DropColumns(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("DropColumns"))

  final val cols = new StringArrayParam(this, "cols", "columns to drop")
  def getCols: Array[String] = $(cols)
  def setCols(v: Seq[String]): this.type = set(cols, v.toArray)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    ds.toDF().drop(getCols.toIndexedSeq: _*)
  }
  override def transformSchema(schema: StructType): StructType = {
    val missing = getCols.filterNot(schema.fieldNames.contains)
    require(missing.isEmpty, s"DropColumns: missing ${missing.mkString(", ")}")
    StructType(schema.filterNot(f => getCols.contains(f.name)))
  }
  override def copy(extra: ParamMap): DropColumns = defaultCopy(extra)
}
object DropColumns extends DefaultParamsReadable[DropColumns]

/** Rename one column (ref: core/.../stages/RenameColumn.scala:30-43). */
class RenameColumn(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("RenameColumn"))

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    ds.toDF().withColumnRenamed(getInputCol, getOutputCol)
  }
  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains(getInputCol),
      s"RenameColumn: missing $getInputCol")
    StructType(schema.map(f =>
      if (f.name == getInputCol) f.copy(name = getOutputCol) else f))
  }
  override def copy(extra: ParamMap): RenameColumn = defaultCopy(extra)
}
object RenameColumn extends DefaultParamsReadable[RenameColumn]

/** Explode an array column into `outputCol`, one row per element
  * (ref: core/.../stages/Explode.scala:26-39). Uses the built-in Generator
  * so whole-stage codegen applies.
  */
class Explode(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("Explode"))

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    ds.toDF().withColumn(getOutputCol, explode(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType = {
    schema(getInputCol).dataType match {
      case ArrayType(et, containsNull) =>
        StructType(schema :+ StructField(getOutputCol, et, containsNull))
      case other =>
        throw new IllegalArgumentException(
          s"Explode: $getInputCol must be ArrayType, got $other")
    }
  }
  override def copy(extra: ParamMap): Explode = defaultCopy(extra)
}
object Explode extends DefaultParamsReadable[Explode]
