package graft.io.http

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Write a DataFrame into a REST search index (ref: cognitive/.../
  * AzureSearchWriter + AzureSearchAPI.scala: derive the index definition
  * from the frame's schema, create the index once, then push batched
  * `{"value":[{"@search.action": ...}, ...]}` uploads).
  *
  * Spark-first shape: the index-definition POST happens once on the
  * driver; the document stream is per-row JSON built by codegen'd
  * `to_json`, grouped into `batchSize` uploads with one `collect_list`
  * window per partition slice (no global shuffle), and POSTed through
  * [[HTTPTransformer]]'s pooled async client — so upload throughput
  * scales with executors and one failing batch surfaces as a status row
  * instead of killing the job.
  */
class SearchIndexWriter(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("SearchIndexWriter"))

  final val serviceUrl = new Param[String](this, "serviceUrl",
    "search service base url (e.g. http://host:port)")
  def setServiceUrl(v: String): this.type = set(serviceUrl, v)
  final val indexName = new Param[String](this, "indexName", "index name")
  def setIndexName(v: String): this.type = set(indexName, v)
  final val keyCol = new Param[String](this, "keyCol", "key field column")
  def setKeyCol(v: String): this.type = set(keyCol, v)
  final val action = new Param[String](this, "action",
    "per-document action", ParamValidators.inArray(Array(
      "upload", "merge", "mergeOrUpload", "delete")))
  setDefault(action -> "upload")
  def setAction(v: String): this.type = set(action, v)
  final val batchSize = new IntParam(this, "batchSize",
    "documents per upload request", ParamValidators.gt(0))
  setDefault(batchSize -> 100)
  def setBatchSize(v: Int): this.type = set(batchSize, v)
  final val apiKey = new Param[String](this, "apiKey", "api-key header value")
  setDefault(apiKey -> "")
  def setApiKey(v: String): this.type = set(apiKey, v)
  final val createIndex = new BooleanParam(this, "createIndex",
    "create the index from the schema before uploading")
  setDefault(createIndex -> true)
  def setCreateIndex(v: Boolean): this.type = set(createIndex, v)

  /** Edm type for a Spark field (the schema→index mapping the reference's
    * AzureSearchWriter derives). */
  private[http] def edmType(dt: DataType): String = dt match {
    case StringType => "Edm.String"
    case IntegerType | ShortType | ByteType => "Edm.Int32"
    case LongType => "Edm.Int64"
    case FloatType | DoubleType => "Edm.Double"
    case BooleanType => "Edm.Boolean"
    case TimestampType | DateType => "Edm.DateTimeOffset"
    case ArrayType(inner, _) => s"Collection(${edmType(inner)})"
    case other =>
      throw new IllegalArgumentException(s"no Edm mapping for $other")
  }

  /** Index definition JSON derived from the frame schema. */
  private[http] def indexDefinition(schema: StructType): String = {
    require(isSet(keyCol), "setKeyCol first")
    val fields = schema.fields.map { f =>
      val key = if (f.name == $(keyCol)) ""","key":true""" else ""
      s"""{"name":"${f.name}","type":"${edmType(f.dataType)}"$key}"""
    }
    s"""{"name":"${$(indexName)}","fields":[${fields.mkString(",")}]}"""
  }

  /** POST the index definition once, from the driver. */
  private def ensureIndex(schema: StructType): Unit = {
    val client = java.net.http.HttpClient.newHttpClient()
    val req = java.net.http.HttpRequest
      .newBuilder(java.net.URI.create(s"${$(serviceUrl)}/indexes"))
      .header("Content-Type", "application/json")
      .header("api-key", $(apiKey))
      .POST(java.net.http.HttpRequest.BodyPublishers
        .ofString(indexDefinition(schema)))
      .build()
    val resp = client.send(req,
      java.net.http.HttpResponse.BodyHandlers.ofString())
    require(resp.statusCode() < 300,
      s"index creation failed: HTTP ${resp.statusCode()} ${resp.body()}")
  }

  /** Returns one row per uploaded batch: (batch_docs, statusCode). */
  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(serviceUrl) && isSet(indexName), "set serviceUrl/indexName")
    val df = ds.toDF()
    if ($(createIndex)) ensureIndex(df.schema)
    val docJson = to_json(struct(
      lit($(action)).as("@search.action") +:
        df.columns.toIndexedSeq.map(col): _*))
    // per-partition batching via FixedMiniBatch — narrow, no shuffle of
    // the document stream
    val batched = new graft.stages.FixedMiniBatchTransformer()
      .setBatchSize($(batchSize))
      .transform(df.select(docJson.as("__doc")))
      .select(size(col("__doc")).as("batch_docs"),
        concat(lit("""{"value":["""), array_join(col("__doc"), ","),
          lit("]}")).as("__body"))
    val url = s"${$(serviceUrl)}/indexes/${$(indexName)}/docs/index"
    val withReq = batched.withColumn("request", HTTPSchema.toRequest(
      lit(url), lit("POST"), col("__body").cast("binary"),
      array(HTTPSchema.header("Content-Type", lit("application/json")),
        HTTPSchema.header("api-key", lit($(apiKey))))))
    new HTTPTransformer().setInputCol("request").setOutputCol("__resp")
      .transform(withReq)
      .select(col("batch_docs"),
        col("__resp.statusCode").as("statusCode"))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(StructField("batch_docs", IntegerType),
      StructField("statusCode", IntegerType)))
  override def copy(extra: ParamMap): SearchIndexWriter = defaultCopy(extra)
}
object SearchIndexWriter extends graft.core.GraftReadable[SearchIndexWriter]

