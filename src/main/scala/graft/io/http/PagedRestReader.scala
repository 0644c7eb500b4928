package graft.io.http

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Paged REST search source (ref: cognitive/.../BingImageSearch.scala:
  * 32-130 — per-query offset/count pagination against a REST API, items
  * exploded to one row each, chained into downloadFromUrls). The Bing
  * service itself is unreachable offline, so this is the generic shape:
  * a URL template with `{query}` / `{offset}` / `{count}` placeholders,
  * one GET per (query, page), and a JSON items field parsed against a
  * caller-supplied item schema.
  *
  * Spark-first: the (query × page) grid is built relationally (explode
  * over a literal page-offset array — no driver loop), page fetches fan
  * out through [[HTTPTransformer]]'s pooled async client with its
  * retry/backoff, and item parsing is codegen'd `from_json`. Requests
  * per query are bounded by `maxPages`; a failed page yields null items
  * (dropped by the explode) rather than a task failure, matching the
  * reference's tolerant handler.
  */
class PagedRestReader(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PagedRestReader"))

  final val urlTemplate = new Param[String](this, "urlTemplate",
    "URL with {query}/{offset}/{count} placeholders")
  def setUrlTemplate(v: String): this.type = set(urlTemplate, v)
  final val pageSize = new IntParam(this, "pageSize",
    "items per page ({count})", ParamValidators.gt(0))
  setDefault(pageSize -> 50)
  def setPageSize(v: Int): this.type = set(pageSize, v)
  final val maxPages = new IntParam(this, "maxPages",
    "pages fetched per query", ParamValidators.gt(0))
  setDefault(maxPages -> 1)
  def setMaxPages(v: Int): this.type = set(maxPages, v)
  final val itemsField = new Param[String](this, "itemsField",
    "JSON field holding the item array (e.g. Bing's 'value')")
  setDefault(itemsField -> "value")
  def setItemsField(v: String): this.type = set(itemsField, v)
  final val itemSchema = new Param[String](this, "itemSchema",
    "item struct schema, DDL (e.g. 'name STRING, contentUrl STRING')")
  def setItemSchema(v: String): this.type = set(itemSchema, v)
  final val concurrency = new IntParam(this, "concurrency",
    "in-flight page fetches per task", ParamValidators.gt(0))
  setDefault(concurrency -> 4)
  def setConcurrency(v: Int): this.type = set(concurrency, v)
  final val headers = new Param[Array[String]](this, "headers",
    "name:value request headers (e.g. the subscription-key header)")
  setDefault(headers -> Array.empty[String])
  def setHeaders(v: Array[String]): this.type = set(headers, v)

  /** Template → Column: literal segments concatenated with the
    * url-encoded query and the page's offset/count. */
  private val placeholderRe = "\\{(query|offset|count)\\}".r
  private def urlCol(query: Column, offset: Column): Column = {
    val tmpl = $(urlTemplate)
    val cols = scala.collection.mutable.ArrayBuffer.empty[Column]
    var last = 0
    for (m <- placeholderRe.findAllMatchIn(tmpl)) {
      if (m.start > last) cols += lit(tmpl.substring(last, m.start))
      cols += (m.group(1) match {
        case "query"  => url_encode(query)
        case "offset" => offset.cast("string")
        case "count"  => lit($(pageSize)).cast("string")
      })
      last = m.end
    }
    if (last < tmpl.length) cols += lit(tmpl.substring(last))
    if (cols.isEmpty) lit("") else concat(cols.toSeq: _*)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(urlTemplate) && isSet(itemSchema),
      "set urlTemplate and itemSchema first")
    val df = ds.toDF()
    val pageOffsets = array(
      (0 until $(maxPages)).map(p => lit(p * $(pageSize))): _*)
    val hdrCols = $(headers).toIndexedSeq.map { h =>
      val Array(n, v) = h.split(":", 2)
      HTTPSchema.header(n.trim, lit(v.trim))
    }
    val paged = df
      .withColumn("__offset", explode(pageOffsets))
      .withColumn("request", HTTPSchema.toRequest(
        urlCol(col(getInputCol), col("__offset")), lit("GET"),
        lit(null).cast("binary"), array(hdrCols: _*)))
    val fetched = new HTTPTransformer().setInputCol("request")
      .setOutputCol("__resp").setConcurrency($(concurrency))
      .transform(paged)
    val respSchema = StructType(Seq(StructField($(itemsField),
      ArrayType(StructType.fromDDL($(itemSchema))))))
    fetched
      .withColumn("__items", from_json(
        col("__resp.entity").cast("string"), respSchema)
        .getField($(itemsField)))
      .select(df.columns.map(col).toIndexedSeq :+
        col("__offset") :+ explode(col("__items")).as("item"): _*)
  }

  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(StructField("__offset", IntegerType),
      StructField("item", StructType.fromDDL($(itemSchema)))))
  override def copy(extra: ParamMap): PagedRestReader = defaultCopy(extra)
}
object PagedRestReader extends graft.core.GraftReadable[PagedRestReader]

