package graft.io.http

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Col-or-literal service parameter (ref: `ServiceParam[T]` —
  * org/apache/spark/ml/param/JsonEncodableParam.scala:1-78: every service
  * knob can be a scalar for the whole frame (Left) or a per-row column
  * (Right)). */
case class ServiceValue[T](value: Either[T, String]) {
  def toColumn(implicit lift: T => Column): Column = value match {
    case Left(v) => lift(v)
    case Right(colName) => col(colName)
  }
}

object ServiceValue {
  def lit_[T](v: T): ServiceValue[T] = ServiceValue(Left(v))
  def col_[T](name: String): ServiceValue[T] = ServiceValue(Right(name))
}

/** REST-service transformer base (ref:
  * cognitive/.../CognitiveServiceBase.scala:155-323): pack the configured
  * scalar/column params into a JSON body, POST each row to the (possibly
  * per-row) URL through [[HTTPTransformer]], parse the JSON reply, split
  * errors. Concrete "services" are thin configs of this class — exactly
  * the reference's structure, minus the Azure endpoints (offline).
  *
  * The whole pipeline is lazy column expressions + one `mapPartitions`
  * with a pooled async client; at scale the HTTP fan-out is bounded by
  * `concurrency` per task and connection reuse is per-executor-JVM.
  */
class ServiceTransformer(override val uid: String) extends Transformer
    with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ServiceTransformer"))
  setDefault(outputCol -> "parsed")

  final val errorCol = new Param[String](this, "errorCol", "error column")
  setDefault(errorCol -> "error")
  def setErrorCol(v: String): this.type = set(errorCol, v)
  final val concurrency = new IntParam(this, "concurrency", "in-flight cap")
  setDefault(concurrency -> 8)
  def setConcurrency(v: Int): this.type = set(concurrency, v)
  final val method = new Param[String](this, "method", "HTTP method")
  setDefault(method -> "POST")
  def setMethod(v: String): this.type = set(method, v)

  // ServiceParam state rides GraftWritable's complex.bin (case classes
  // and DataTypes are Java-serializable), so configured services persist
  final val urlValueParam = new Param[ServiceValue[String]](
    this, "urlValueParam", "service url, literal or column")
  private def urlValue: ServiceValue[String] = get(urlValueParam).orNull
  def setUrl(v: String): this.type = set(urlValueParam, ServiceValue.lit_(v))
  def setUrlCol(v: String): this.type = set(urlValueParam, ServiceValue.col_[String](v))

  // body params: name -> scalar or column
  final val bodyParamsParam = new Param[Seq[(String, ServiceValue[Any])]](
    this, "bodyParamsParam", "body params, literal or column each")
  setDefault(bodyParamsParam -> Seq.empty[(String, ServiceValue[Any])])
  private def bodyParams: Seq[(String, ServiceValue[Any])] = $(bodyParamsParam)
  def setBodyParam(name: String, value: Any): this.type =
    set(bodyParamsParam, bodyParams :+ (name -> ServiceValue.lit_(value)))
  def setBodyParamCol(name: String, colName: String): this.type =
    set(bodyParamsParam, bodyParams :+ (name -> ServiceValue.col_[Any](colName)))
  // header params (e.g. api keys)
  final val headerParamsParam = new Param[Seq[(String, String)]](
    this, "headerParamsParam", "request headers")
  setDefault(headerParamsParam -> Seq.empty[(String, String)])
  private def headerParams: Seq[(String, String)] = $(headerParamsParam)
  def setHeader(name: String, value: String): this.type =
    set(headerParamsParam, headerParams :+ (name -> value))

  final val outputSchemaParam = new Param[DataType](this, "outputSchemaParam",
    "parsed output schema")
  private def outputSchema: DataType = get(outputSchemaParam).orNull
  def setOutputDataType(dt: DataType): this.type = set(outputSchemaParam, dt)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(urlValue != null, "setUrl/setUrlCol first")
    require(outputSchema != null, "setOutputDataType first")
    require(bodyParams.nonEmpty, "at least one body param")
    val df = ds.toDF()
    val urlCol: Column = urlValue.value match {
      case Left(u) => lit(u)
      case Right(c) => col(c)
    }
    val body = to_json(struct(bodyParams.map {
      case (name, ServiceValue(Left(v))) => lit(v).as(name)
      case (name, ServiceValue(Right(c))) => col(c).as(name)
    }: _*))
    val headers = array(
      (("Content-Type" -> "application/json") +: headerParams).map {
        case (n, v) => HTTPSchema.header(n, lit(v))
      }: _*)
    val withReq = df.withColumn("__req",
      HTTPSchema.toRequest(urlCol, lit($(method)), body.cast("binary"), headers))
    val withResp = new HTTPTransformer().setInputCol("__req")
      .setOutputCol("__resp").setConcurrency($(concurrency))
      .transform(withReq)
    val status = col("__resp").getField("statusCode")
    new JSONOutputParser().setInputCol("__resp").setOutputCol(getOutputCol)
      .setDataType(outputSchema).transform(withResp)
      .withColumn($(errorCol), when(status >= 200 && status < 300,
        lit(null).cast(StringType))
        .otherwise(concat(lit("HTTP "), status.cast(StringType))))
      .withColumn(getOutputCol, when(col($(errorCol)).isNull, col(getOutputCol)))
      .drop("__req", "__resp")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(StructField(getOutputCol, outputSchema),
      StructField($(errorCol), StringType)))
  override def copy(extra: ParamMap): ServiceTransformer = defaultCopy(extra)
}
object ServiceTransformer extends graft.core.GraftReadable[ServiceTransformer]

