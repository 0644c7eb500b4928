package graft.text

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Data Selection via Importance Resampling (public method: Xie et al.
  * 2023, "Data Selection for Language Models via Importance Resampling",
  * NeurIPS — the DSIR recipe behind many published pre-training data
  * curations): fit a cheap n-gram language model on a small TARGET
  * corpus (the distribution you want, e.g. curated/high-quality docs)
  * and another on the RAW corpus, then score every raw document by the
  * per-token log importance ratio log p_target(doc) - log p_raw(doc) —
  * documents that look more like the target than like the average raw
  * doc score high and are kept. The paper's feature space is hashed
  * bag-of-bigrams; here the two LMs are [[UnigramLM]] instances with
  * `gramSize = 2` by default (set 1 for plain unigram).
  *
  * Scale shape: BOTH LMs fit from one corpus explode — a single hash
  * aggregation keyed by gram carrying (raw count, target count), then
  * three bounded actions over the persisted vocabulary-sized count frame
  * (equivalent to two independent [[UnigramLM]] fits, minus three of the
  * four corpus passes); scoring broadcasts the two (gram -> count) maps
  * and runs as a single narrow pass — no shuffle, no per-row state, the
  * same 100 TB contract as `lm_perplexity`. Selection is a pure
  * threshold on the scaled-integer
  * score, so it is deterministic and partitioning-independent (the
  * paper's Gumbel top-k sampling trades that determinism for variance
  * reduction; a threshold on the ratio is its deterministic analogue).
  *
  * Outputs: `dsir_n_tokens` (grams scored), `dsir_logratio` (nats/gram,
  * = ce_raw - ce_target: positive = target-like), `dsir_logratio_q4`
  * (= floor(lr*1e4+0.5), the oracle-gated form), `dsir_selected`
  * (= logratio_q4 >= `selectThresholdQ4`).
  */
class DSIRScorer(override val uid: String)
    extends Estimator[DSIRModel] with HasInputCol
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("DSIRScorer"))

  final val targetPredicate = new Param[String](this, "targetPredicate",
    "SQL predicate selecting the target subset out of the fitted " +
      "dataset, e.g. \"source = 'curated'\"")
  def setTargetPredicate(v: String): this.type = set(targetPredicate, v)

  final val vocabSize = new IntParam(this, "vocabSize",
    "vocabulary bound for both language models", ParamValidators.gt(0))
  setDefault(vocabSize -> 65536)
  def setVocabSize(v: Int): this.type = set(vocabSize, v)

  final val alpha = new DoubleParam(this, "alpha",
    "add-alpha smoothing mass per type", ParamValidators.gt(0.0))
  setDefault(alpha -> 1.0)
  def setAlpha(v: Double): this.type = set(alpha, v)

  final val gramSize = new IntParam(this, "gramSize",
    "n-gram feature size for both LMs (paper: 2)", ParamValidators.gt(0))
  setDefault(gramSize -> 2)
  def setGramSize(v: Int): this.type = set(gramSize, v)

  final val selectThresholdQ4 = new LongParam(this, "selectThresholdQ4",
    "dsir_selected = dsir_logratio_q4 >= this (q4-scaled nats/gram)")
  setDefault(selectThresholdQ4 -> 0L)
  def setSelectThresholdQ4(v: Long): this.type = set(selectThresholdQ4, v)

  override def fit(ds: Dataset[_]): DSIRModel = {
    val df = ds.toDF()
    // ONE corpus explode serves BOTH language models: per-gram
    // (raw count, target count) in a single hash aggregation, then three
    // bounded actions over the persisted vocabulary-sized frame. This is
    // exactly equivalent to two independent UnigramLM fits (grams absent
    // from the target have __ct = 0 and are filtered, matching the
    // separate fit's count frame; tie-breaks are identical) but replaces
    // four explode-the-corpus passes with one — at corpus scale the
    // explode IS the fit cost.
    val cnt = PipelineFunctions.explodeNGrams(
        df.select(expr($(targetPredicate)).cast(BooleanType).as("__is_t"),
          UnigramLM.tokens(col(getInputCol)).as("__toks")),
        col("__toks"), $(gramSize), "__g")
      .select("__is_t", "__g")
      .groupBy("__g")
      .agg(count(lit(1)).as("__c"),
        sum(when(col("__is_t"), lit(1L)).otherwise(lit(0L))).as("__ct"))
    cnt.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = try {
      val tot = cnt.agg(coalesce(sum("__c"), lit(0L)),
        coalesce(sum("__ct"), lit(0L))).head()
      val (totalRaw, totalTgt) = (tot.getLong(0), tot.getLong(1))
      val rawVocab = cnt.orderBy(col("__c").desc, col("__g").asc)
        .limit($(vocabSize)).select(col("__g"), col("__c")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      val tgtVocab = cnt.where(col("__ct") > 0)
        .orderBy(col("__ct").desc, col("__g").asc)
        .limit($(vocabSize)).select(col("__g"), col("__ct")).collect()
        .map(r => r.getString(0) -> r.getLong(1))
      def mk(suffix: String, vocab: Array[(String, Long)], total: Long) = {
        val lm = new UnigramLMModel(uid + suffix).setInputCol(getInputCol)
        lm.setAlpha($(alpha)); lm.setGramSize($(gramSize))
        lm.vocab = vocab; lm.totalTokens = total
        lm
      }
      val model = new DSIRModel(uid + "_model").setInputCol(getInputCol)
      model.setSelectThresholdQ4($(selectThresholdQ4))
      model.targetLM = mk("_tgt", tgtVocab, totalTgt)
      model.rawLM = mk("_raw", rawVocab, totalRaw)
      model
    } finally cnt.unpersist(blocking = false)
    m
  }
  override def transformSchema(schema: StructType): StructType =
    DSIRModel.outputSchema(schema)
  override def copy(extra: ParamMap): DSIRScorer = defaultCopy(extra)
}

object DSIRScorer extends graft.core.GraftReadable[DSIRScorer]

class DSIRModel(override val uid: String) extends Model[DSIRModel]
    with HasInputCol with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("DSIRModel"))

  final val selectThresholdQ4 = new LongParam(this, "selectThresholdQ4",
    "dsir_selected = dsir_logratio_q4 >= this (q4-scaled nats/gram)")
  setDefault(selectThresholdQ4 -> 0L)
  def setSelectThresholdQ4(v: Long): this.type = set(selectThresholdQ4, v)

  var targetLM: UnigramLMModel = _
  var rawLM: UnigramLMModel = _

  override def transform(ds: Dataset[_]): DataFrame = {
    val withTarget = targetLM.transform(ds.toDF())
      .withColumnRenamed("lm_ce", "__dsir_tce")
      .withColumnRenamed("lm_n_tokens", "dsir_n_tokens")
      .drop("lm_n_oov", "lm_ce_q4")
    // both LMs share tokenization, so n_tokens is emitted once; the
    // logratio subtracts the two UNROUNDED per-doc means in a fixed
    // order (ce_raw - ce_target) before the single q4 rounding step
    rawLM.transform(withTarget)
      .withColumn("dsir_logratio", col("lm_ce") - col("__dsir_tce"))
      .withColumn("dsir_logratio_q4",
        floor(col("dsir_logratio") * 10000.0 + 0.5).cast(LongType))
      .withColumn("dsir_selected",
        col("dsir_logratio_q4") >= $(selectThresholdQ4))
      .drop("lm_n_tokens", "lm_n_oov", "lm_ce", "lm_ce_q4", "__dsir_tce")
  }
  override def transformSchema(schema: StructType): StructType =
    DSIRModel.outputSchema(schema)
  override def copy(extra: ParamMap): DSIRModel = {
    val c = new DSIRModel(uid)
    c.targetLM = targetLM; c.rawLM = rawLM
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(DSIRModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(DSIRModel.this))
        targetLM.write.overwrite().save(s"$path/targetLM")
        rawLM.write.overwrite().save(s"$path/rawLM")
      }
    }
}

object DSIRModel extends org.apache.spark.ml.util.MLReadable[DSIRModel] {
  private[text] def outputSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("dsir_n_tokens", LongType),
      StructField("dsir_logratio", DoubleType),
      StructField("dsir_logratio_q4", LongType),
      StructField("dsir_selected", BooleanType)))

  override def read: org.apache.spark.ml.util.MLReader[DSIRModel] =
    new org.apache.spark.ml.util.MLReader[DSIRModel] {
      override def load(path: String): DSIRModel = {
        val m = new DSIRModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.targetLM = UnigramLMModel.load(s"$path/targetLM")
        m.rawLM = UnigramLMModel.load(s"$path/rawLM")
        m
      }
    }
}
