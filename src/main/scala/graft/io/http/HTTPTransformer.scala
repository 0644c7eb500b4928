package graft.io.http

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.time.Duration
import java.util.concurrent.{CompletableFuture, TimeUnit}

/** Retry policy for transient HTTP failures (ref:
  * io/http/HTTPClients.scala:74-146 "advanced handler": retry 5xx with a
  * sleep schedule, honor Retry-After on 429, treat 4xx as terminal).
  */
case class RetryPolicy(backoffsMs: Seq[Long] = Seq(100L, 500L, 1000L))
    extends Serializable {
  def shouldRetry(status: Int): Boolean = status >= 500 || status == 429

  /** Delay before retry `n` (0-based): `Retry-After` (seconds, capped at
    * 30 s) wins when the service sent one, else the backoff schedule
    * (clamped to its last entry). */
  def delayMs(n: Int, retryAfterHeader: Option[String]): Long =
    retryAfterHeader.flatMap(_.trim.toLongOption)
      .map(s => math.min(s * 1000L, 30000L))
      .getOrElse(
        if (backoffsMs.isEmpty) 100L
        else backoffsMs(math.min(n, backoffsMs.length - 1)))
}

/** Request-struct column → response-struct column over a per-JVM pooled
  * `java.net.http.HttpClient` with up to `concurrency` in-flight async
  * requests per partition, completions yielded in input order (ref:
  * io/http/HTTPTransformer.scala:86-141 + AsyncUtils.bufferedAwait
  * core/utils/AsyncUtils.scala:1-64).
  *
  * Scale design: the client is a JVM singleton (connection reuse across
  * tasks); the async window keeps `concurrency` requests outstanding
  * while preserving row order (a sliding buffer, not a barrier); rows
  * stream — nothing is materialized per partition.
  */
class HTTPTransformer(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("HTTPTransformer"))
  setDefault(inputCol -> "request", outputCol -> "response")

  final val concurrency = new IntParam(this, "concurrency",
    "max in-flight requests per partition", ParamValidators.gt(0))
  setDefault(concurrency -> 8)
  def setConcurrency(v: Int): this.type = set(concurrency, v)
  final val timeoutMs = new LongParam(this, "timeoutMs", "per-request timeout")
  setDefault(timeoutMs -> 30000L)
  def setTimeoutMs(v: Long): this.type = set(timeoutMs, v)
  final val retries = new IntParam(this, "retries",
    "max retries for 5xx/429", ParamValidators.gtEq(0))
  setDefault(retries -> 3)
  def setRetries(v: Int): this.type = set(retries, v)
  final val backoffs = new IntArrayParam(this, "backoffs",
    "retry backoff schedule in ms (clamped to last entry)")
  setDefault(backoffs -> Array(100, 500, 1000))
  def setBackoffs(v: Array[Int]): this.type = set(backoffs, v)
  final val asyncReply = new BooleanParam(this, "asyncReply",
    "follow 202 Operation-Location long-running-operation polling " +
      "(ref: cognitive/.../CognitiveServiceBase.scala BasicAsyncReply)")
  setDefault(asyncReply -> false)
  def setAsyncReply(v: Boolean): this.type = set(asyncReply, v)
  final val pollIntervalMs = new LongParam(this, "pollIntervalMs",
    "delay between long-running-operation status polls")
  setDefault(pollIntervalMs -> 1000L)
  def setPollIntervalMs(v: Long): this.type = set(pollIntervalMs, v)
  final val maxPolls = new IntParam(this, "maxPolls",
    "max long-running-operation status polls", ParamValidators.gt(0))
  setDefault(maxPolls -> 100)
  def setMaxPolls(v: Int): this.type = set(maxPolls, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val inIdx = df.schema.fieldIndex(graft.core.SchemaChecks.resolve(df.schema, getInputCol))
    val outSchema = transformSchema(df.schema)
    val conc = $(concurrency)
    val tmo = $(timeoutMs)
    val maxRetries = $(retries)
    val policy = RetryPolicy($(backoffs).map(_.toLong).toSeq)
    val doAsyncReply = $(asyncReply)
    val pollDelay = $(pollIntervalMs)
    val pollCap = $(maxPolls)
    val clientHolder = SharedSingleton("graft-http-client") {
      HttpClient.newBuilder()
        .connectTimeout(Duration.ofMillis(30000))
        .followRedirects(HttpClient.Redirect.NORMAL)
        .build()
    }
    val enc = ExpressionEncoder(outSchema)
    df.mapPartitions { it =>
      val client = clientHolder.get
      def send(req: Row): CompletableFuture[Row] = {
        val url = req.getString(0)
        val method = req.getString(1)
        val entity = if (req.isNullAt(3)) null else req.getAs[Array[Byte]](3)
        val b = HttpRequest.newBuilder(URI.create(url))
          .timeout(Duration.ofMillis(tmo))
        if (!req.isNullAt(2)) req.getSeq[Row](2).foreach { h =>
          b.header(h.getString(0), h.getString(1))
        }
        val body =
          if (entity == null) HttpRequest.BodyPublishers.noBody()
          else HttpRequest.BodyPublishers.ofByteArray(entity)
        val request = b.method(method, body).build()
        def toRow(resp: HttpResponse[Array[Byte]]): Row = {
          val headers = resp.headers().map().entrySet().toArray
            .map(_.asInstanceOf[java.util.Map.Entry[String, java.util.List[String]]])
            .flatMap(e => e.getValue.toArray.map(v => Row(e.getKey, v.toString)))
          Row(resp.statusCode(), null, headers.toSeq, resp.body())
        }
        def after[T](delay: Long)(task: () => CompletableFuture[T]): CompletableFuture[T] = {
          val f = new CompletableFuture[T]()
          CompletableFuture.delayedExecutor(delay, TimeUnit.MILLISECONDS)
            .execute { () =>
              // a synchronous throw from task() must surface as a failed
              // future — a swallowed one would hang the ordered window's
              // blocking get() forever
              try task().whenComplete { (r, e) =>
                if (e != null) f.completeExceptionally(e) else f.complete(r)
              } catch { case t: Throwable => f.completeExceptionally(t) }
            }
          f
        }
        // long-running-operation poll: GET Operation-Location until the
        // body's "status" is terminal (succeeded/failed/cancelled)
        val terminalStatus =
          "(?i)\"status\"\\s*:\\s*\"(succeeded|failed|cancell?ed)\"".r
        def poll(pollUrl: String, n: Int): CompletableFuture[Row] = {
          val pb = HttpRequest.newBuilder(URI.create(pollUrl))
            .timeout(Duration.ofMillis(tmo))
          if (!req.isNullAt(2)) req.getSeq[Row](2)
            .filterNot(_.getString(0).equalsIgnoreCase("Content-Type"))
            .foreach(h => pb.header(h.getString(0), h.getString(1)))
          client.sendAsync(pb.GET().build(), HttpResponse.BodyHandlers.ofByteArray())
            .thenCompose { resp =>
              val bodyStr = if (resp.body() == null) ""
                else new String(resp.body(), java.nio.charset.StandardCharsets.UTF_8)
              if (n >= pollCap || resp.statusCode() >= 400 ||
                  terminalStatus.findFirstIn(bodyStr).isDefined)
                CompletableFuture.completedFuture(toRow(resp))
              else after(pollDelay)(() => poll(pollUrl, n + 1))
            }
        }
        def attempt(n: Int): CompletableFuture[Row] =
          client.sendAsync(request, HttpResponse.BodyHandlers.ofByteArray())
            .handle[CompletableFuture[Row]] { (resp, err) =>
              if (err != null) {
                // transport-level failures (connect refused/reset, timeout)
                // retry on the same backoff schedule as 5xx — a transient
                // socket hiccup must not poison a row when retries remain
                if (n < maxRetries) after(policy.delayMs(n, None))(() => attempt(n + 1))
                else CompletableFuture.failedFuture[Row](err)
              } else if (n < maxRetries && policy.shouldRetry(resp.statusCode())) {
                // async backoff; a 429's Retry-After overrides the schedule
                val delay = policy.delayMs(n,
                  Option(resp.headers().firstValue("Retry-After").orElse(null)))
                after(delay)(() => attempt(n + 1))
              } else {
                val opLoc = resp.headers().firstValue("Operation-Location")
                  .or(() => resp.headers().firstValue("operation-location"))
                if (doAsyncReply && resp.statusCode() == 202 && opLoc.isPresent)
                  poll(opLoc.get(), 0)
                else CompletableFuture.completedFuture(toRow(resp))
              }
            }
            .thenCompose(f => f)
        attempt(0)
          .exceptionally { e =>
            Row(0, Option(e.getMessage).getOrElse(e.getClass.getName),
              Seq.empty[Row], null)
          }
      }
      // sliding async window: keep `conc` in flight, emit in input order
      val buffered = new Iterator[Row] {
        private val queue = scala.collection.mutable.Queue.empty[(Row, CompletableFuture[Row])]
        private def fill(): Unit =
          while (queue.size < conc && it.hasNext) {
            val row = it.next()
            queue.enqueue((row, send(row.getStruct(inIdx))))
          }
        fill()
        def hasNext: Boolean = queue.nonEmpty
        def next(): Row = {
          val (row, fut) = queue.dequeue()
          fill()
          Row.fromSeq(row.toSeq :+ fut.get())
        }
      }
      buffered
    }(enc)
  }
  override def transformSchema(schema: StructType): StructType = {
    require(schema(getInputCol).dataType.isInstanceOf[StructType],
      s"$getInputCol must be a request struct")
    StructType(schema :+ StructField(getOutputCol, HTTPSchema.responseType))
  }
  override def copy(extra: ParamMap): HTTPTransformer = defaultCopy(extra)
}
object HTTPTransformer extends graft.core.GraftReadable[HTTPTransformer]


/** Column list → JSON-body POST request struct (ref:
  * io/http/Parsers.scala:35-88 JSONInputParser). */
class JSONInputParser(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("JSONInputParser"))
  setDefault(outputCol -> "request")

  final val urlParam = new Param[String](this, "urlParam", "target url")
  def setUrl(v: String): this.type = set(urlParam, v)
  final val method = new Param[String](this, "method", "HTTP method")
  setDefault(method -> "POST")
  def setMethod(v: String): this.type = set(method, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val body = to_json(struct($(inputCols).map(col).toIndexedSeq: _*))
    df.withColumn(getOutputCol, HTTPSchema.toRequest(
      lit($(urlParam)), lit($(method)), body,
      array(HTTPSchema.header("Content-Type", lit("application/json")))))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, HTTPSchema.requestType))
  override def copy(extra: ParamMap): JSONInputParser = defaultCopy(extra)
}
object JSONInputParser extends graft.core.GraftReadable[JSONInputParser]


/** User-supplied input → request-struct mapping as a NAMED stage (ref:
  * io/http/Parsers.scala:90-146 CustomInputParser — there a UDF from T to
  * HTTPRequestData). Spark-first shape: the function builds a Column
  * (native expressions stay codegen'd; a UDF-based function works too),
  * and it persists through GraftWritable's complex.bin like Lambda's.
  */
class CustomInputParser(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("CustomInputParser"))
  setDefault(outputCol -> "request")

  final val requestFn = new Param[Column => Column](this, "requestFn",
    "input column -> request-struct column")
  def setUDF(f: Column => Column): this.type = set(requestFn, f)
  /** Convenience: url-building function over the input column; the
    * request is a bodyless GET to that url. */
  def setUrlFn(f: Column => Column): this.type = set(requestFn,
    (in: Column) => HTTPSchema.toRequest(f(in), lit("GET"),
      lit(null).cast(BinaryType)))

  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(requestFn), "setUDF/setUrlFn first")
    ds.toDF().withColumn(getOutputCol, $(requestFn)(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, HTTPSchema.requestType))
  override def copy(extra: ParamMap): CustomInputParser = defaultCopy(extra)
}
object CustomInputParser extends graft.core.GraftReadable[CustomInputParser]


/** User-supplied response → value mapping as a NAMED stage (ref:
  * Parsers.scala:152-293 CustomOutputParser — a UDF from
  * HTTPResponseData to T). The function receives the response-struct
  * Column; use HTTPSchema.entityToString for the body text. */
class CustomOutputParser(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("CustomOutputParser"))
  setDefault(inputCol -> "response", outputCol -> "output")

  final val responseFn = new Param[Column => Column](this, "responseFn",
    "response-struct column -> output column")
  def setUDF(f: Column => Column): this.type = set(responseFn, f)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(responseFn), "setUDF first")
    ds.toDF().withColumn(getOutputCol, $(responseFn)(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType = {
    require(isSet(responseFn), "setUDF first")
    val spark = org.apache.spark.sql.SparkSession.active
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
      schema).withColumn(getOutputCol, $(responseFn)(col(getInputCol))).schema
  }
  override def copy(extra: ParamMap): CustomOutputParser = defaultCopy(extra)
}
object CustomOutputParser extends graft.core.GraftReadable[CustomOutputParser]


/** Response entity → typed struct via from_json(schema) (ref:
  * Parsers.scala:152-293 JSONOutputParser). */
class JSONOutputParser(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("JSONOutputParser"))
  setDefault(inputCol -> "response", outputCol -> "parsed")

  final val dataTypeParam = new Param[DataType](this, "dataTypeParam",
    "result schema (persisted via Java serialization)")
  private def schema_ : DataType = get(dataTypeParam).orNull
  def setDataType(dt: DataType): this.type = set(dataTypeParam, dt)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(schema_ != null, "setDataType first")
    ds.toDF().withColumn(getOutputCol,
      from_json(HTTPSchema.entityToString(col(getInputCol)), schema_))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, schema_))
  override def copy(extra: ParamMap): JSONOutputParser = defaultCopy(extra)
}
object JSONOutputParser extends graft.core.GraftReadable[JSONOutputParser]


/** Response entity → string column (ref: StringOutputParser). */
class StringOutputParser(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("StringOutputParser"))
  setDefault(inputCol -> "response", outputCol -> "output")
  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn(getOutputCol,
      HTTPSchema.entityToString(col(getInputCol)))
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, StringType))
  override def copy(extra: ParamMap): StringOutputParser = defaultCopy(extra)
}
object StringOutputParser extends graft.core.GraftReadable[StringOutputParser]


/** Composite JSON-service transformer: input parser → HTTPTransformer →
  * error split → output parser → drop temps (ref:
  * io/http/SimpleHTTPTransformer.scala:64-171). Rows whose response
  * status ≠ 2xx get null output and the status in `errorCol`.
  */
class SimpleHTTPTransformer(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("SimpleHTTPTransformer"))
  setDefault(outputCol -> "parsed")

  final val urlParam = new Param[String](this, "urlParam", "service url")
  def setUrl(v: String): this.type = set(urlParam, v)
  final val errorCol = new Param[String](this, "errorCol", "error column")
  setDefault(errorCol -> "error")
  def setErrorCol(v: String): this.type = set(errorCol, v)
  final val concurrency = new IntParam(this, "concurrency", "in-flight cap")
  setDefault(concurrency -> 8)
  def setConcurrency(v: Int): this.type = set(concurrency, v)

  final val outputSchemaParam = new Param[DataType](this, "outputSchemaParam",
    "parsed output schema (persisted via Java serialization)")
  private def outputSchema: DataType = get(outputSchemaParam).orNull
  def setOutputDataType(dt: DataType): this.type = set(outputSchemaParam, dt)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(outputSchema != null, "setOutputDataType first")
    val df = ds.toDF()
    val withReq = new JSONInputParser().setInputCols($(inputCols).toSeq)
      .setUrl($(urlParam)).setOutputCol("__req").transform(df)
    val withResp = new HTTPTransformer().setInputCol("__req")
      .setOutputCol("__resp").setConcurrency($(concurrency))
      .transform(withReq)
    val status = col("__resp").getField("statusCode")
    val parsed = new JSONOutputParser().setInputCol("__resp")
      .setOutputCol(getOutputCol).setDataType(outputSchema)
      .transform(withResp)
    parsed
      .withColumn($(errorCol), when(status >= 200 && status < 300, lit(null)
        .cast(StringType)).otherwise(concat(lit("HTTP "), status.cast(StringType))))
      .withColumn(getOutputCol, when(col($(errorCol)).isNull, col(getOutputCol)))
      .drop("__req", "__resp")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(StructField(getOutputCol, outputSchema),
      StructField($(errorCol), StringType)))
  override def copy(extra: ParamMap): SimpleHTTPTransformer = defaultCopy(extra)
}
object SimpleHTTPTransformer extends graft.core.GraftReadable[SimpleHTTPTransformer]

