package graft.featurize

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Cast a list of columns to a target type, with date parse/format support
  * (ref: featurize/DataConversion.scala:69-161). All conversions are native
  * Column expressions (`cast`, `to_timestamp`, `date_format`) so they stay
  * inside whole-stage codegen and push through the optimizer.
  *
  * Supported `convertTo`: boolean, byte, short, integer, long, float,
  * double, string, date (uses `dateTimeFormat` to parse from string or
  * format to string when the source is a timestamp).
  */
class DataConversion(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("DataConversion"))

  final val cols = new StringArrayParam(this, "cols", "columns to convert")
  def setCols(v: Seq[String]): this.type = set(cols, v.toArray)
  final val convertTo = new Param[String](this, "convertTo", "target type",
    ParamValidators.inArray(Array("boolean", "byte", "short", "integer",
      "long", "float", "double", "string", "date")))
  def setConvertTo(v: String): this.type = set(convertTo, v)
  final val dateTimeFormat = new Param[String](this, "dateTimeFormat",
    "SimpleDateFormat-style pattern for date conversions")
  setDefault(dateTimeFormat -> "yyyy-MM-dd HH:mm:ss")
  def setDateTimeFormat(v: String): this.type = set(dateTimeFormat, v)

  private def convert(dt: DataType, c: String) = $(convertTo) match {
    case "date" => dt match {
      case StringType => to_timestamp(col(c), $(dateTimeFormat))
      case TimestampType | TimestampNTZType | DateType =>
        date_format(col(c), $(dateTimeFormat))
      case other => throw new IllegalArgumentException(
        s"DataConversion: cannot date-convert $other")
    }
    case t => col(c).cast(t)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    $(cols).foldLeft(df)((cur, c) => cur.withColumn(c, convert(ds.schema(c).dataType, c)))
  }
  override def transformSchema(schema: StructType): StructType = {
    val target: String => DataType = c => $(convertTo) match {
      case "date" => schema(c).dataType match {
        case StringType => TimestampType
        case _ => StringType
      }
      case "integer" => IntegerType
      case t => CatalystSqlParser.parse(t)
    }
    StructType(schema.map(f =>
      if ($(cols).contains(f.name)) f.copy(dataType = target(f.name)) else f))
  }
  private object CatalystSqlParser {
    def parse(t: String): DataType = t match {
      case "boolean" => BooleanType
      case "byte" => ByteType
      case "short" => ShortType
      case "long" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "string" => StringType
      case other => DataType.fromDDL(other)
    }
  }
  override def copy(extra: ParamMap): DataConversion = defaultCopy(extra)
}
object DataConversion extends DefaultParamsReadable[DataConversion]
