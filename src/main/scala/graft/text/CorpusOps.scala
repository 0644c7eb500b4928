package graft.text

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Corpus-level text statistics and filtering beyond per-document signals
  * (builder brief: training-data-pipeline operators). */

/** Top-k most frequent word n-grams across the corpus — the standard
  * boilerplate / template detector in large-scale curation (the most
  * common 10-grams of a crawl are cookie banners and licence headers;
  * their doc-frequency feeds removal rules and repetition audits).
  *
  * Scale shape: explode → hash-aggregate count (map-side partial
  * combine, one shuffle of (gram, partial-count) pairs) → global top-k
  * via sort-limit, which Spark plans as `TakeOrderedAndProject` — each
  * partition keeps only its k best, the driver merges k×partitions
  * rows, and no global sort ever materializes. Deterministic: total
  * order (count desc, gram asc).
  */
class FrequentNGrams(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("FrequentNGrams"))

  final val n = new IntParam(this, "n", "n-gram size", ParamValidators.gt(0))
  setDefault(n -> 3)
  def setN(v: Int): this.type = set(n, v)
  final val topK = new IntParam(this, "topK", "grams to keep",
    ParamValidators.gt(0))
  setDefault(topK -> 20)
  def setTopK(v: Int): this.type = set(topK, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    PipelineFunctions.explodeNGrams(
        ds.toDF()
          .select(split(lower(trim(col(getInputCol))), "\\s+").as("__toks")),
        col("__toks"), $(n), "gram")
      .select("gram")
      .groupBy("gram").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("gram"))
      .limit($(topK))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(StructField("gram", StringType),
      StructField("cnt", LongType, nullable = false)))
  override def copy(extra: ParamMap): FrequentNGrams = defaultCopy(extra)
}
object FrequentNGrams extends graft.core.GraftReadable[FrequentNGrams]


/** Gopher-style document quality filter (Rae et al. 2021 §A1.1, public):
  * keeps documents whose cheap structural signals clear configurable
  * thresholds — token-count window, composite quality score, minimum
  * stopword evidence. The signals are [[DocumentAnalyzer]]'s (integer /
  * q4-scaled, hash-gate-safe); the filter is one narrow codegen'd
  * projection + predicate, no shuffle — at 100 TB it rides the scan.
  */
class QualityFilter(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("QualityFilter"))

  final val minTokens = new IntParam(this, "minTokens", "min token count")
  setDefault(minTokens -> 50)
  def setMinTokens(v: Int): this.type = set(minTokens, v)
  final val maxTokens = new IntParam(this, "maxTokens", "max token count")
  setDefault(maxTokens -> 100000)
  def setMaxTokens(v: Int): this.type = set(maxTokens, v)
  /** Threshold on the q4-scaled composite quality score (0..10000). */
  final val minQualityQ4 = new LongParam(this, "minQualityQ4",
    "min floor(quality*1e4+0.5)")
  setDefault(minQualityQ4 -> 2500L)
  def setMinQualityQ4(v: Long): this.type = set(minQualityQ4, v)
  /** Gopher's "must contain at least N stop words" evidence rule. */
  final val minStopwordHits = new LongParam(this, "minStopwordHits",
    "min stopword occurrences")
  setDefault(minStopwordHits -> 0L)
  def setMinStopwordHits(v: Long): this.type = set(minStopwordHits, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val c = col(getInputCol)
    ds.toDF().filter(
      TextFunctions.tokenCount(c).between($(minTokens), $(maxTokens)) &&
        TextFunctions.qualityScaled(c) >= $(minQualityQ4) &&
        TextFunctions.stopwordHits(c) >= $(minStopwordHits))
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): QualityFilter = defaultCopy(extra)
}
object QualityFilter extends graft.core.GraftReadable[QualityFilter]

/** The Gopher §A1.1 STRUCTURAL quality signals (Rae et al. 2021, public)
  * that [[QualityFilter]]'s composite does not carry — the line- and
  * word-shape rules: fraction of words containing an alphabetic
  * character (paper keeps docs with ≥ 80%), symbol-to-word ratio for
  * `#` and ellipses (paper drops > 0.1), fraction of lines STARTING
  * with a bullet (paper drops > 90%), and fraction of lines ENDING with
  * an ellipsis (paper drops > 30%). Emitted as exact integers plus
  * q4-scaled ratios (floor(r·1e4+0.5) — the hash-gate-safe convention),
  * so the thresholds above are one narrow `filter` away.
  *
  * Scale shape: a single codegen'd projection — split/filter/transform
  * over literal character classes (engine-portable, no `\p{...}`
  * Unicode-table drift), no shuffle, no state; at 100 TB it rides the
  * scan. Lines are `\n`-split then trimmed, empty lines dropped (the
  * LineDeduplicator convention); ellipses count both `...` and `…`.
  *
  * Columns: `gs_n_words`, `gs_n_alpha_words`, `gs_alpha_word_q4`,
  * `gs_n_symbols`, `gs_symbol_word_q4`, `gs_n_lines`,
  * `gs_n_bullet_lines`, `gs_bullet_line_q4`, `gs_n_ellipsis_lines`,
  * `gs_ellipsis_line_q4`.
  */
class GopherSignals(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("GopherSignals"))

  override def transform(ds: Dataset[_]): DataFrame = {
    import PipelineFunctions.q4
    val c = coalesce(col(getInputCol), lit(""))
    val words = filter(split(trim(c), "\\s+"), w => length(w) > 0)
    val alphaWords = filter(words, w => w.rlike("[A-Za-z]"))
    // non-overlapping left-to-right counts via replace-length arithmetic
    // (identical semantics in Spark and DuckDB)
    val nHash = length(c) - length(regexp_replace(c, "#", ""))
    val nDots = (length(c) - length(replace(c, lit("..."), lit("")))) / 3
    val nHellip = length(c) - length(regexp_replace(c, "…", ""))
    val lines = filter(
      org.apache.spark.sql.functions.transform(split(c, "\n"), l => trim(l)),
      l => length(l) > 0)
    val bulletLines = filter(lines,
      l => substring(l, 1, 1).isin("-", "*", "•", "‣", "▶"))
    val ellipsisLines = filter(lines,
      l => l.endsWith("...") || l.endsWith("…"))
    ds.toDF()
      .withColumn("gs_n_words", size(words).cast(LongType))
      .withColumn("gs_n_alpha_words", size(alphaWords).cast(LongType))
      .withColumn("gs_alpha_word_q4",
        q4(col("gs_n_alpha_words"), col("gs_n_words")))
      .withColumn("gs_n_symbols", (nHash + nDots + nHellip).cast(LongType))
      .withColumn("gs_symbol_word_q4",
        q4(col("gs_n_symbols"), col("gs_n_words")))
      .withColumn("gs_n_lines", size(lines).cast(LongType))
      .withColumn("gs_n_bullet_lines", size(bulletLines).cast(LongType))
      .withColumn("gs_bullet_line_q4",
        q4(col("gs_n_bullet_lines"), col("gs_n_lines")))
      .withColumn("gs_n_ellipsis_lines", size(ellipsisLines).cast(LongType))
      .withColumn("gs_ellipsis_line_q4",
        q4(col("gs_n_ellipsis_lines"), col("gs_n_lines")))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      "gs_n_words", "gs_n_alpha_words", "gs_alpha_word_q4",
      "gs_n_symbols", "gs_symbol_word_q4", "gs_n_lines",
      "gs_n_bullet_lines", "gs_bullet_line_q4",
      "gs_n_ellipsis_lines", "gs_ellipsis_line_q4")
      .map(StructField(_, LongType)))
  override def copy(extra: ParamMap): GopherSignals = defaultCopy(extra)
}
object GopherSignals extends graft.core.GraftReadable[GopherSignals]
