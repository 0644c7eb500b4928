package graft.io.http

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** URL column → bytes column: pooled async GETs through [[HTTPTransformer]]
  * (shared JVM client, sliding concurrency window, 5xx/429 retry policy),
  * emitting the body as a binary column plus the status code — the
  * packaged form of the reference's image-download helper
  * (ref: cognitive/.../BingImageSearch.scala:28-67 `downloadFromUrls`).
  *
  * Scale design: inherits HTTPTransformer's per-partition streaming window
  * — `concurrency` requests in flight per task, rows never materialized,
  * connection pool shared per executor JVM. Failed downloads (non-2xx or
  * transport error) yield a null bytes column so one dead URL in 100 TB of
  * crawl data cannot kill the job; set `dropFailures` to filter them.
  */
class DownloadFromUrls(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("DownloadFromUrls"))
  setDefault(inputCol -> "url", outputCol -> "bytes")

  final val concurrency = new IntParam(this, "concurrency",
    "max in-flight downloads per partition", ParamValidators.gt(0))
  setDefault(concurrency -> 8)
  def setConcurrency(v: Int): this.type = set(concurrency, v)
  final val timeoutMs = new LongParam(this, "timeoutMs", "per-request timeout")
  setDefault(timeoutMs -> 30000L)
  def setTimeoutMs(v: Long): this.type = set(timeoutMs, v)
  final val retries = new IntParam(this, "retries",
    "max retries for 5xx/429", ParamValidators.gtEq(0))
  setDefault(retries -> 3)
  def setRetries(v: Int): this.type = set(retries, v)
  final val dropFailures = new BooleanParam(this, "dropFailures",
    "drop rows whose download did not return 2xx")
  setDefault(dropFailures -> false)
  def setDropFailures(v: Boolean): this.type = set(dropFailures, v)
  final val statusCol = new Param[String](this, "statusCol",
    "output column for the HTTP status code (0 = transport error)")
  setDefault(statusCol -> "download_status")
  def setStatusCol(v: String): this.type = set(statusCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val reqCol = s"__dl_req_$uid"
    val respCol = s"__dl_resp_$uid"
    val withReq = df.withColumn(reqCol, HTTPSchema.toRequest(
      col(getInputCol), lit("GET"), lit(null).cast(BinaryType)))
    val fetched = new HTTPTransformer(uid + "_http")
      .setInputCol(reqCol).setOutputCol(respCol)
      .setConcurrency($(concurrency)).setTimeoutMs($(timeoutMs))
      .setRetries($(retries))
      .transform(withReq)
    val status = col(respCol).getField("statusCode")
    val ok = status >= 200 && status < 300
    val out = fetched
      .withColumn(getOutputCol,
        when(ok, col(respCol).getField("entity")))
      .withColumn($(statusCol), status)
      .drop(reqCol, respCol)
    if ($(dropFailures)) out.filter(col($(statusCol)) >= 200 &&
      col($(statusCol)) < 300)
    else out
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField(getOutputCol, BinaryType),
      StructField($(statusCol), IntegerType)))
  override def copy(extra: ParamMap): DownloadFromUrls = defaultCopy(extra)
}
object DownloadFromUrls extends graft.core.GraftReadable[DownloadFromUrls]

