package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** HTML → plain text extraction — the step between a crawl's `response`
  * records ([[graft.io.warc.WarcFiles]]) and every text operator in
  * this library (the WET-conversion step of the C4/CCNet pipelines).
  *
  * Deliberately a deterministic TAG-LEVEL extractor, not a DOM parser:
  * the whole transform is a fixed chain of codegen'd `regexp_replace`
  * expressions (drop comments and script/style/head subtrees, convert
  * block-level tags to line breaks, strip remaining tags, decode the
  * common entities, normalize whitespace) — one narrow zero-shuffle
  * projection whose every step the DuckDB oracle replays verbatim.
  * Regexes stay inside the Java∩RE2 common subset (no `\s`, whose
  * character class differs between engines; explicit classes instead)
  * so Spark and the oracle agree byte-for-byte. Content-density
  * boilerplate pruning (justext-style) is intentionally NOT here: its
  * inputs are per-BLOCK statistics, which downstream
  * [[C4Filter]]/[[GopherSignals]] line rules already cover on the
  * extracted text.
  *
  * Numeric character references: only the universal few are decoded
  * (`&#39; &#34;`); general `&#x...;` decoding needs computed
  * characters, which neither a regexp chain nor the oracle can
  * express — a documented non-goal at this layer.
  */
class HtmlTextExtractor(override val uid: String)
    extends Transformer with HasInputCol with HasOutputCol
    with GraftWritable {
  def this() = this(Identifiable.randomUID("HtmlTextExtractor"))
  setDefault(outputCol -> "text")

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn($(outputCol),
      HtmlTextExtractor.extract(col(getInputCol)))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), StringType))
  override def copy(extra: ParamMap): HtmlTextExtractor = defaultCopy(extra)
}

object HtmlTextExtractor extends GraftReadable[HtmlTextExtractor] {

  /** (pattern, replacement) chain — applied in order; mirrored
    * step-for-step by the `html_extract` oracle SQL. */
  val steps: Seq[(String, String)] = Seq(
    // 1. comments (DOTALL, non-greedy)
    ("(?s)<!--.*?-->", ""),
    // 2. non-content subtrees, case-insensitive
    ("(?is)<script\\b[^>]*>.*?</script>", ""),
    ("(?is)<style\\b[^>]*>.*?</style>", ""),
    ("(?is)<noscript\\b[^>]*>.*?</noscript>", ""),
    ("(?is)<head\\b[^>]*>.*?</head>", ""),
    // 3. block-level tags become line breaks (open or close)
    ("(?i)</?(p|div|br|h[1-6]|li|ul|ol|table|tr|td|th|blockquote|" +
      "section|article|header|footer|pre|form)\\b[^>]*>", "\n"),
    // 4. every remaining tag vanishes
    ("<[^>]+>", ""),
    // 5. entities — &amp; LAST so it cannot create new entities
    ("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"), ("&quot;", "\""),
    ("&#34;", "\""), ("&#39;", "'"), ("&apos;", "'"), ("&amp;", "&"),
    // 6. whitespace: horizontal runs to one space, strip around
    // newlines, collapse 3+ newlines to a blank line (explicit
    // classes — no \s, whose Java and RE2 definitions differ)
    ("[ \\t\\r]+", " "),
    (" ?\\n ?", "\n"),
    // one line per block: adjacent close+open tags and source newlines
    // stack, and the line-level consumers (LineDeduplicator, C4Filter,
    // GopherSignals) want one boundary per block, not typography
    ("\\n{2,}", "\n"),
    // anchors, not trim(): both engines' trim strips spaces only
    ("^\\n+", ""), ("\\n+$", ""))

  /** The full chain as one nested column expression; leading/trailing
    * spaces trimmed last. */
  def extract(c: Column): Column =
    trim(steps.foldLeft(c) { case (acc, (p, r)) =>
      regexp_replace(acc, p, r)
    })
}
