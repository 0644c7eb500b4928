package graft.io.http

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** PowerBI-shaped REST rows sink (ref: core/.../io/powerbi/PowerBIWriter
  * .scala:27-114: DataFrame → batched JSON rows POSTed to a push URL, in
  * both batch and streaming mode, with {batchSize, concurrency,
  * consolidate} options). Unlike [[SearchIndexWriter]] there is no index
  * or schema step — the rows go straight to the endpoint, wrapped in a
  * configurable envelope (default the PowerBI push shape
  * `{"rows":[...]}`).
  *
  * Spark-first shape: per-row JSON via codegen'd `to_json`, per-partition
  * minibatching (no shuffle of the row stream), optional per-JVM
  * [[graft.stages.PartitionConsolidator]] when many small partitions
  * would otherwise each POST tiny batches, and the pooled async
  * [[HTTPTransformer]] client for the uploads — so throughput scales
  * with executors and retry/backoff (5xx, 429 + Retry-After) comes from
  * the shared client, not a bespoke loop.
  */
class RestRowsWriter(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("RestRowsWriter"))

  final val url = new Param[String](this, "url", "endpoint URL")
  def setUrl(v: String): this.type = set(url, v)
  final val batchSize = new IntParam(this, "batchSize",
    "rows per POST", ParamValidators.gt(0))
  setDefault(batchSize -> 100)
  def setBatchSize(v: Int): this.type = set(batchSize, v)
  final val concurrency = new IntParam(this, "concurrency",
    "in-flight POSTs per task", ParamValidators.gt(0))
  setDefault(concurrency -> 1)
  def setConcurrency(v: Int): this.type = set(concurrency, v)
  final val consolidate = new BooleanParam(this, "consolidate",
    "funnel each JVM's partitions through one task before batching")
  setDefault(consolidate -> false)
  def setConsolidate(v: Boolean): this.type = set(consolidate, v)
  /** `%s` is replaced by the JSON array of row objects. */
  final val envelope = new Param[String](this, "envelope",
    "body template; %s = JSON row array")
  setDefault(envelope -> """{"rows":%s}""")
  def setEnvelope(v: String): this.type = set(envelope, v)
  final val token = new Param[String](this, "token",
    "Authorization: Bearer token ('' = no auth header)")
  setDefault(token -> "")
  def setToken(v: String): this.type = set(token, v)
  final val retries = new IntParam(this, "retries",
    "retry attempts for retryable statuses", ParamValidators.gtEq(0))
  setDefault(retries -> 3)
  def setRetries(v: Int): this.type = set(retries, v)

  /** One row per uploaded batch: (batch_docs, statusCode). */
  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(url), "setUrl first")
    val df0 = ds.toDF()
    val docJson = to_json(struct(df0.columns.toIndexedSeq.map(col): _*))
    val docs = df0.select(docJson.as("__doc"))
    val funneled =
      if ($(consolidate))
        new graft.stages.PartitionConsolidator().transform(docs)
      else docs
    val parts = $(envelope).split("%s", -1)
    require(parts.length == 2, "envelope must contain exactly one %s")
    val (pre, post) = (parts(0), parts(1))
    val batched = new graft.stages.FixedMiniBatchTransformer()
      .setBatchSize($(batchSize))
      .transform(funneled)
      .select(size(col("__doc")).as("batch_docs"),
        concat(lit(pre + "["), array_join(col("__doc"), ","),
          lit("]" + post)).as("__body"))
    val headers = Seq(
      HTTPSchema.header("Content-Type", lit("application/json"))) ++
      (if ($(token).nonEmpty)
        Seq(HTTPSchema.header("Authorization", lit(s"Bearer ${$(token)}")))
      else Nil)
    val withReq = batched.withColumn("request", HTTPSchema.toRequest(
      lit($(url)), lit("POST"), col("__body").cast("binary"),
      array(headers: _*)))
    new HTTPTransformer().setInputCol("request").setOutputCol("__resp")
      .setConcurrency($(concurrency)).setRetries($(retries))
      .transform(withReq)
      .select(col("batch_docs"),
        col("__resp.statusCode").as("statusCode"))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(StructField("batch_docs", IntegerType),
      StructField("statusCode", IntegerType)))
  override def copy(extra: ParamMap): RestRowsWriter = defaultCopy(extra)
}

/** The reference's two entry points (PowerBIWriter.write / .stream),
  * re-expressed: eager batch upload that fails loudly on any failed
  * batch, and a `foreachBatch` streaming variant of the same. */
object RestRowsWriter extends graft.core.GraftReadable[RestRowsWriter] {
  private def writer(url: String, options: Map[String, String]): RestRowsWriter = {
    val w = new RestRowsWriter().setUrl(url)
    options.get("batchSize").foreach(v => w.setBatchSize(v.toInt))
    options.get("concurrency").foreach(v => w.setConcurrency(v.toInt))
    options.get("consolidate").foreach(v => w.setConsolidate(v.toBoolean))
    options.get("envelope").foreach(w.setEnvelope)
    options.get("token").foreach(w.setToken)
    options.get("retries").foreach(v => w.setRetries(v.toInt))
    w
  }

  /** Upload `df` now; throws if any batch still failed after retries. */
  def write(df: DataFrame, url: String,
            options: Map[String, String] = Map.empty): Unit = {
    val failed = writer(url, options).transform(df)
      .filter(col("statusCode") < 200 || col("statusCode") >= 300)
      .agg(count(lit(1)).as("batches"),
        coalesce(sum("batch_docs"), lit(0L)).as("rows"),
        max("statusCode").as("status"))
      .head()
    if (failed.getLong(0) > 0)
      throw new RuntimeException(
        s"RestRowsWriter: ${failed.getLong(0)} batch(es) / " +
          s"${failed.getLong(1)} row(s) failed; worst HTTP status " +
          s"${failed.get(2)}")
  }

  /** Streaming variant: each micro-batch goes through [[write]]. Call
    * `.start()` (plus trigger/checkpoint options) on the result. */
  def stream(df: DataFrame, url: String,
             options: Map[String, String] = Map.empty)
      : org.apache.spark.sql.streaming.DataStreamWriter[Row] =
    df.writeStream.foreachBatch {
      (batch: Dataset[Row], _: Long) => write(batch, url, options)
    }
}
