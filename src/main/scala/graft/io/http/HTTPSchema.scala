package graft.io.http

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Spark-struct representation of HTTP requests/responses (ref:
  * core/.../io/http/HTTPSchema.scala:26-180 — HTTPRequestData /
  * HTTPResponseData case-class bindings). Entities travel as binary so
  * arbitrary payloads (JSON, images, audio) ride the same column type.
  */
object HTTPSchema {

  val headerType: StructType = StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("value", StringType, nullable = false)))

  val requestType: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("method", StringType, nullable = false),
    StructField("headers", ArrayType(headerType), nullable = true),
    StructField("entity", BinaryType, nullable = true)))

  val responseType: StructType = StructType(Seq(
    StructField("statusCode", IntegerType, nullable = false),
    StructField("reasonPhrase", StringType, nullable = true),
    StructField("headers", ArrayType(headerType), nullable = true),
    StructField("entity", BinaryType, nullable = true)))

  /** Column builder: request struct from url/method/entity expressions
    * (ref: HTTPSchema `to_http_request` builders). */
  def toRequest(url: Column, method: Column, entity: Column,
                headers: Column = lit(null).cast(ArrayType(headerType))): Column =
    struct(
      url.cast(StringType).as("url"),
      method.cast(StringType).as("method"),
      headers.as("headers"),
      entity.cast(BinaryType).as("entity"))

  /** Response entity bytes as UTF-8 string (ref: `entity_to_string`). */
  def entityToString(response: Column): Column =
    response.getField("entity").cast(StringType)

  def header(name: String, value: Column): Column =
    struct(lit(name).as("name"), value.cast(StringType).as("value"))
}
