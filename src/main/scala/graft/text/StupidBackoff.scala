package graft.text

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Stupid-backoff n-gram language model (Brants et al. 2007, "Large
  * Language Models in Machine Translation" — THE distributed-LM
  * construction: unnormalized count ratios with a constant backoff
  * factor, designed so the model fits/scores with nothing but n-gram
  * counts from a MapReduce-shaped aggregation, no held-out smoothing
  * passes). Scores documents for corpus-quality filtering the way
  * [[UnigramLM]] does, but with higher-order context:
  *
  *   S(w | ctx_k) = count(ctx_k w) / count(ctx_k)      if count > 0
  *                = 0.4 * S(w | ctx_{k-1})             otherwise
  *
  * The order-1 base case deviates from Brants' bare count(w)/N by using
  * the family's add-alpha unigram with UNK pooling ([[UnigramLM]]'s
  * model) so out-of-vocabulary tokens score finitely — Brants assumes a
  * closed vocabulary; a quality filter cannot.
  *
  * Scale shape: fit is ONE corpus explode that tags every word n-gram of
  * every order 1..maxOrder with its order, one map-side-combined hash
  * aggregation over (order, gram), and one bounded TakeOrdered collect
  * per order (top `vocabSize` unigrams / top `gramBudget` per higher
  * order, (count desc, gram asc) — deterministic). transform broadcasts
  * the per-order count maps and scores every document in a single narrow
  * pass. Count pruning composes with backoff exactly as in the paper's
  * serving systems: a pruned (or unseen) n-gram backs off; a pruned
  * CONTEXT count likewise forces backoff, so the score depends only on
  * the shipped tables and is reproducible anywhere — including the
  * DuckDB oracle, which replays the pruning and the backoff chain.
  *
  * Outputs: `sb_n_tokens` plus per-order hit counts `sb_hits_<k>`
  * (positions scored at exactly order k — exact integers), and the
  * per-token negative-log score `sb_ce` with its gate form `sb_ce_q4`.
  */
class StupidBackoffLM(override val uid: String)
    extends Estimator[StupidBackoffLMModel] with HasInputCol
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("StupidBackoffLM"))

  final val maxOrder = new IntParam(this, "maxOrder",
    "highest n-gram order", ParamValidators.inRange(1, 5))
  setDefault(maxOrder -> 3)
  def setMaxOrder(v: Int): this.type = set(maxOrder, v)
  final val vocabSize = new IntParam(this, "vocabSize",
    "top-V unigrams kept by (count desc, token asc); the rest pool into " +
      "UNK at the base order", ParamValidators.gt(0))
  setDefault(vocabSize -> 65536)
  def setVocabSize(v: Int): this.type = set(vocabSize, v)
  final val gramBudget = new IntParam(this, "gramBudget",
    "top-B grams kept per order above 1, by (count desc, gram asc); " +
      "pruned grams back off", ParamValidators.gt(0))
  setDefault(gramBudget -> 262144)
  def setGramBudget(v: Int): this.type = set(gramBudget, v)
  final val alpha = new DoubleParam(this, "alpha",
    "add-alpha smoothing mass per type at the unigram base",
    ParamValidators.gt(0.0))
  setDefault(alpha -> 1.0)
  def setAlpha(v: Double): this.type = set(alpha, v)
  final val backoff = new DoubleParam(this, "backoff",
    "constant backoff factor (the paper's 0.4)", ParamValidators.gt(0.0))
  setDefault(backoff -> 0.4)
  def setBackoff(v: Double): this.type = set(backoff, v)

  override def fit(ds: Dataset[_]): StupidBackoffLMModel = {
    // one corpus pass: every order's grams, tagged. Two chained INDEX
    // explodes — positions, then the ≤maxOrder windows starting at each
    // position — so no generator child is ever a gram-array expression
    // (the explodeNGrams rationale: the optimizer's inferred generator
    // filter would re-run the whole tagged-gram transform at the scan,
    // with the token split inlined per position — O(len²) per doc)
    val toks = col("__toks")
    val withPos = ds.toDF()
      .select(UnigramLM.tokens(col(getInputCol)).as("__toks"))
      .withColumn("__i", explode(
        when(size(toks) >= 1, sequence(lit(1), size(toks)))
          .otherwise(array().cast(ArrayType(IntegerType)))))
    // grams of every order starting at position __i that fit; the
    // second generator's child references only attributes, so its
    // inferred filter is O(maxOrder)
    val perPos = org.apache.spark.sql.functions.filter(
      array((1 to $(maxOrder)).map { n =>
        when(col("__i") + (n - 1) <= size(toks),
          struct(lit(n).as("o"),
            (if (n == 1) element_at(toks, col("__i"))
             else array_join(slice(toks, col("__i"), lit(n)), " ")).as("g")))
      }: _*), x => x.isNotNull)
    val cnt = withPos
      .select(explode(perPos).as("__og"))
      .select(col("__og.o").as("__o"), col("__og.g").as("__g"))
      .groupBy("__o", "__g").agg(count(lit(1)).as("__c"))
    cnt.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val (total, tables) = try {
      val t = cnt.filter(col("__o") === 1)
        .agg(coalesce(sum("__c"), lit(0L))).head().getLong(0)
      // bounded TakeOrdered per order — maxOrder extra actions over the
      // persisted vocabulary-sized frame, never the corpus
      val tabs = (1 to $(maxOrder)).map { n =>
        val budget = if (n == 1) $(vocabSize) else $(gramBudget)
        cnt.filter(col("__o") === n)
          .orderBy(col("__c").desc, col("__g").asc)
          .limit(budget).collect()
          .map(r => r.getString(1) -> r.getLong(2))
      }.toArray
      (t, tabs)
    } finally cnt.unpersist(blocking = false)
    val m = new StupidBackoffLMModel(uid + "_model").setInputCol(getInputCol)
    m.setAlpha($(alpha)); m.setBackoff($(backoff))
    m.tables = tables
    m.totalTokens = total
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StupidBackoffLM.outputSchema(schema, $(maxOrder))
  override def copy(extra: ParamMap): StupidBackoffLM = defaultCopy(extra)
}

object StupidBackoffLM extends graft.core.GraftReadable[StupidBackoffLM] {
  private[text] def outputSchema(schema: StructType, maxOrder: Int): StructType =
    StructType(schema ++ Seq(StructField("sb_n_tokens", LongType)) ++
      (1 to maxOrder).map(k => StructField(s"sb_hits_$k", LongType)) ++
      Seq(StructField("sb_ce", DoubleType), StructField("sb_ce_q4", LongType)))
}

class StupidBackoffLMModel(override val uid: String)
    extends Model[StupidBackoffLMModel] with HasInputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("StupidBackoffLMModel"))

  final val alpha = new DoubleParam(this, "alpha",
    "add-alpha smoothing mass per type at the unigram base",
    ParamValidators.gt(0.0))
  setDefault(alpha -> 1.0)
  def setAlpha(v: Double): this.type = set(alpha, v)
  final val backoff = new DoubleParam(this, "backoff",
    "constant backoff factor", ParamValidators.gt(0.0))
  setDefault(backoff -> 0.4)
  def setBackoff(v: Double): this.type = set(backoff, v)

  /** tables(k-1) = the order-k (gram -> count) list, (count desc, gram
    * asc), bounded by the estimator's budgets. */
  var tables: Array[Array[(String, Long)]] = Array.empty
  /** Total corpus tokens INCLUDING out-of-vocab occurrences. */
  var totalTokens: Long = 0L

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val a = $(alpha)
    val bo = $(backoff)
    val maxOrder = tables.length
    val uni = tables(0)
    val v = uni.length
    val cUnk = totalTokens - uni.iterator.map(_._2).sum
    val denom = totalTokens.toDouble + a * (v + 1)
    val unkNum = cUnk.toDouble + a
    val bc = df.sparkSession.sparkContext
      .broadcast(tables.map(_.toMap))
    val score = udf { toks: Seq[String] =>
      val maps = bc.value
      val n = toks.length
      val hits = new Array[Long](maxOrder)
      var s = 0.0
      var i = 0
      while (i < n) {
        // highest order whose FULL (gram, context) counts survive pruning
        // wins; each step down multiplies by the backoff factor — the
        // nesting order matters for bit-exact oracle replay
        var factor = 1.0
        var k = math.min(maxOrder, i + 1)
        var scored = 0.0
        var done = false
        while (!done && k >= 2) {
          val gram = toks.slice(i - k + 1, i + 1).mkString(" ")
          val ctx = toks.slice(i - k + 1, i).mkString(" ")
          (maps(k - 1).get(gram), maps(k - 2).get(ctx)) match {
            case (Some(cg), Some(cc)) =>
              scored = factor * (cg.toDouble / cc.toDouble)
              hits(k - 1) += 1
              done = true
            case _ =>
              factor *= bo
              k -= 1
          }
        }
        if (!done) {
          val p = maps(0).get(toks(i)) match {
            case Some(c) => (c.toDouble + a) / denom
            case None => unkNum / denom
          }
          scored = factor * p
          hits(0) += 1
        }
        s -= math.log(scored)
        i += 1
      }
      val ce = if (n == 0) 0.0 else s / n
      (n.toLong, hits.toSeq, ce, math.floor(ce * 10000.0 + 0.5).toLong)
    }
    val withCols = df.withColumn("__sb",
        score(UnigramLM.tokens(col(getInputCol))))
      .withColumn("sb_n_tokens", col("__sb._1"))
    val withHits = (1 to maxOrder).foldLeft(withCols) { (d, k) =>
      d.withColumn(s"sb_hits_$k", col("__sb._2").getItem(k - 1))
    }
    withHits
      .withColumn("sb_ce", col("__sb._3"))
      .withColumn("sb_ce_q4", col("__sb._4"))
      .drop("__sb")
  }
  override def transformSchema(schema: StructType): StructType =
    StupidBackoffLM.outputSchema(schema, math.max(tables.length, 1))
  override def copy(extra: ParamMap): StupidBackoffLMModel = {
    val c = new StupidBackoffLMModel(uid)
    c.tables = tables; c.totalTokens = totalTokens
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(StupidBackoffLMModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(StupidBackoffLMModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/tables.bin", tables)
        graft.core.ModelIO.writeObject(sparkSession, s"$path/total.bin",
          java.lang.Long.valueOf(totalTokens))
      }
    }
}

object StupidBackoffLMModel
    extends org.apache.spark.ml.util.MLReadable[StupidBackoffLMModel] {
  override def read: org.apache.spark.ml.util.MLReader[StupidBackoffLMModel] =
    new org.apache.spark.ml.util.MLReader[StupidBackoffLMModel] {
      override def load(path: String): StupidBackoffLMModel = {
        val m = new StupidBackoffLMModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.tables = graft.core.ModelIO
          .readObject[Array[Array[(String, Long)]]](sparkSession,
            s"$path/tables.bin")
        m.totalTokens = graft.core.ModelIO
          .readObject[java.lang.Long](sparkSession, s"$path/total.bin")
          .longValue()
        m
      }
    }
}
