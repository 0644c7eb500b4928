package graft.text

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unigram-language-model subword tokenizer (Kudo 2018, "Subword
  * Regularization"; the SentencePiece unigram model), trained — like
  * [[BPETokenizer]] — on a WORD-FREQUENCY DICTIONARY rather than the
  * running corpus. The corpus contributes exactly ONE map-side-combined
  * word-count aggregation with a bounded deterministic top-K collect;
  * seeding, EM, and likelihood-loss pruning then run driver-side over
  * at most `maxWordTypes` word types, so training cost is independent
  * of corpus size — the construction that makes the trainer usable at
  * 100 TB.
  *
  * Words carry the SentencePiece word-boundary prefix (U+2581 "▁"), so
  * pieces like "▁the" arise naturally and decoding is the standard
  * concatenate-then-restore-spaces rule: `decode(encode(text))`
  * reconstructs the canonical (lowercased, space-normalized) text
  * EXACTLY — the same losslessness contract, and driver gate shape, as
  * BPE's. A document containing the literal boundary mark would decode
  * with an extra space — the standard construction's known limitation,
  * inherited knowingly.
  *
  * Training follows the published algorithm with its standard
  * implementation simplifications, all deterministic:
  *  1. seed vocabulary = every ≤`maxPieceLen`-codepoint substring of
  *     the (boundary-prefixed) dictionary words, scored by occurrence
  *     mass, top `seedSize` kept (count desc, piece asc);
  *  2. per prune round, `emIters` full-EM iterations (forward-backward
  *     expected piece counts over every segmentation, maximum-likelihood
  *     M-step — log-space throughout);
  *  3. prune to `pruneFactor` of the current size by likelihood loss:
  *     pieces on no word's Viterbi path cost nothing and go first;
  *     otherwise loss = Σ count·(viterbi-with − viterbi-without),
  *     computed by re-decoding only the words on whose path the piece
  *     sits (ties: loss asc, piece asc) — one round costs about one EM
  *     iteration, the SentencePiece trick;
  *  4. stop at `vocabSize`; single-codepoint pieces are never pruned
  *     (full character coverage), and unseen characters at encode time
  *     fall back to a floor-probability single-char piece, so the
  *     roundtrip contract survives out-of-vocabulary text.
  */
class UnigramTokenizer(override val uid: String)
    extends Estimator[UnigramTokenizerModel] with HasInputCol
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("UnigramTokenizer"))

  final val vocabSize = new IntParam(this, "vocabSize",
    "target piece-vocabulary size (floor; never below character coverage)",
    ParamValidators.gt(0))
  setDefault(vocabSize -> 8192)
  def setVocabSize(v: Int): this.type = set(vocabSize, v)
  final val maxPieceLen = new IntParam(this, "maxPieceLen",
    "maximum piece length in code points", ParamValidators.gt(0))
  setDefault(maxPieceLen -> 8)
  def setMaxPieceLen(v: Int): this.type = set(maxPieceLen, v)
  final val seedSize = new IntParam(this, "seedSize",
    "seed vocabulary size before pruning", ParamValidators.gt(0))
  setDefault(seedSize -> 32768)
  def setSeedSize(v: Int): this.type = set(seedSize, v)
  final val maxWordTypes = new IntParam(this, "maxWordTypes",
    "top-K word types (count desc, word asc) the trainer sees",
    ParamValidators.gt(0))
  setDefault(maxWordTypes -> 65536)
  def setMaxWordTypes(v: Int): this.type = set(maxWordTypes, v)
  final val emIters = new IntParam(this, "emIters",
    "EM iterations per prune round", ParamValidators.gt(0))
  setDefault(emIters -> 2)
  def setEmIters(v: Int): this.type = set(emIters, v)
  final val pruneFactor = new DoubleParam(this, "pruneFactor",
    "fraction of the vocabulary kept per prune round",
    ParamValidators.inRange(0.0, 1.0, false, false))
  setDefault(pruneFactor -> 0.75)
  def setPruneFactor(v: Double): this.type = set(pruneFactor, v)

  override def fit(ds: Dataset[_]): UnigramTokenizerModel = {
    val dict: Array[(String, Long)] = ds.toDF()
      .select(explode(UnigramLM.tokens(col(getInputCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit($(maxWordTypes)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val m = new UnigramTokenizerModel(uid + "_model").setInputCol(getInputCol)
    m.pieces = Unigram.train(dict, $(vocabSize), $(maxPieceLen),
      $(seedSize), $(emIters), $(pruneFactor))
    m
  }
  override def transformSchema(schema: StructType): StructType =
    Unigram.outputSchema(schema)
  override def copy(extra: ParamMap): UnigramTokenizer = defaultCopy(extra)
}
object UnigramTokenizer extends graft.core.GraftReadable[UnigramTokenizer]

object Unigram {
  /** SentencePiece word-boundary mark (U+2581 LOWER ONE EIGHTH BLOCK). */
  val WB = "▁"
  /** Floor log-probability for out-of-vocabulary single-character
    * fallback pieces — below any trained piece, finite so Viterbi still
    * segments (and the roundtrip survives unseen characters). */
  val UnkLogP = -1e2

  private final case class Word(cps: Array[String], count: Long) {
    val n: Int = cps.length
  }

  private def codePoints(s: String): Array[String] = {
    val cps = s.codePoints().toArray
    val out = new Array[String](cps.length)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i))); i += 1
    }
    out
  }

  /** Train piece log-probabilities over a word-frequency dictionary.
    * Returns (piece, logP) sorted piece-asc, deterministically. */
  def train(dict: Array[(String, Long)], vocabSize: Int, maxPieceLen: Int,
      seedSize: Int, emIters: Int, pruneFactor: Double)
      : Array[(String, Double)] = {
    val words = dict.map { case (w, c) => Word(codePoints(WB + w), c) }
    if (words.isEmpty) return Array.empty

    // ---- seed: substring occurrence mass, single chars mandatory ----
    val freq = scala.collection.mutable.HashMap.empty[String, Double]
    val chars = scala.collection.mutable.HashSet.empty[String]
    for (w <- words) {
      var i = 0
      while (i < w.n) {
        chars += w.cps(i)
        val sb = new StringBuilder
        var j = i
        while (j < w.n && j - i < maxPieceLen) {
          sb.append(w.cps(j))
          val p = sb.toString
          freq(p) = freq.getOrElse(p, 0.0) + w.count.toDouble
          j += 1
        }
        i += 1
      }
    }
    val multi = freq.iterator.filter { case (p, _) => !chars.contains(p) }
      .toArray.sortBy { case (p, c) => (-c, p) }
      .take(math.max(0, seedSize - chars.size)).map(_._1)
    // current vocabulary -> logP, initialized from seed mass
    var vocab: Map[String, Double] = {
      val all = chars.toArray ++ multi
      val tot = all.iterator.map(freq(_)).sum
      all.iterator.map(p => p -> math.log(freq(p) / tot)).toMap
    }

    // ---- EM + prune rounds ----------------------------------------
    val target = math.max(vocabSize, chars.size)
    var rounds = 0
    while (vocab.size > target && rounds < 64) {
      rounds += 1
      var it = 0
      while (it < emIters) { vocab = emStep(words, vocab, maxPieceLen); it += 1 }
      val keep = math.max(target, (vocab.size * pruneFactor).toInt)
      vocab = prune(words, vocab, maxPieceLen, keep, chars)
    }
    var it = 0
    while (it < emIters) { vocab = emStep(words, vocab, maxPieceLen); it += 1 }
    vocab.toArray.sortBy(_._1)
  }

  /** One full-EM iteration: forward-backward expected piece counts over
    * all segmentations of every word, then a maximum-likelihood
    * renormalization. Log-space; pieces with no expected mass keep a
    * floor so they remain prunable rather than NaN. */
  private def emStep(words: Array[Word], vocab: Map[String, Double],
      maxPieceLen: Int): Map[String, Double] = {
    val exp = scala.collection.mutable.HashMap.empty[String, Double]
    for (w <- words) {
      val n = w.n
      val alpha = forward(w, vocab, maxPieceLen)
      if (!alpha(n).isNegInfinity) {
        val beta = backward(w, vocab, maxPieceLen)
        var i = 0
        while (i < n) {
          val sb = new StringBuilder
          var j = i
          while (j < n && j - i < maxPieceLen) {
            sb.append(w.cps(j))
            val p = sb.toString
            vocab.get(p) match {
              case Some(lp) =>
                val post = alpha(i) + lp + beta(j + 1) - alpha(n)
                if (post > -30.0)
                  exp(p) = exp.getOrElse(p, 0.0) + w.count * math.exp(post)
              case None => ()
            }
            j += 1
          }
          i += 1
        }
      }
    }
    val tot = exp.valuesIterator.sum
    vocab.map { case (p, old) =>
      val e = exp.getOrElse(p, 0.0)
      p -> (if (e > 0.0 && tot > 0.0) math.log(e / tot)
            else math.max(old - 10.0, UnkLogP))
    }
  }

  private def forward(w: Word, vocab: Map[String, Double],
      maxPieceLen: Int): Array[Double] = {
    val n = w.n
    val alpha = Array.fill(n + 1)(Double.NegativeInfinity)
    alpha(0) = 0.0
    var i = 0
    while (i < n) {
      if (!alpha(i).isNegInfinity) {
        val sb = new StringBuilder
        var j = i
        while (j < n && j - i < maxPieceLen) {
          sb.append(w.cps(j))
          vocab.get(sb.toString).foreach { lp =>
            alpha(j + 1) = logAdd(alpha(j + 1), alpha(i) + lp)
          }
          j += 1
        }
      }
      i += 1
    }
    alpha
  }

  private def backward(w: Word, vocab: Map[String, Double],
      maxPieceLen: Int): Array[Double] = {
    val n = w.n
    val beta = Array.fill(n + 1)(Double.NegativeInfinity)
    beta(n) = 0.0
    var i = n - 1
    while (i >= 0) {
      val sb = new StringBuilder
      var j = i
      while (j < n && j - i < maxPieceLen) {
        sb.append(w.cps(j))
        vocab.get(sb.toString).foreach { lp =>
          if (!beta(j + 1).isNegInfinity)
            beta(i) = logAdd(beta(i), lp + beta(j + 1))
        }
        j += 1
      }
      i -= 1
    }
    beta
  }

  private def logAdd(a: Double, b: Double): Double =
    if (a.isNegInfinity) b
    else if (b.isNegInfinity) a
    else if (a > b) a + math.log1p(math.exp(b - a))
    else b + math.log1p(math.exp(a - b))

  /** Likelihood-loss pruning to `keep` pieces. Pieces on no Viterbi path
    * cost nothing; for path pieces, re-decode only the words that used
    * them with the piece masked — Σ count·(withLP − withoutLP). Single
    * characters (and the boundary mark) are unprunable: they are the
    * coverage floor. Ties: loss asc, piece asc. */
  private def prune(words: Array[Word], vocab: Map[String, Double],
      maxPieceLen: Int, keep: Int, chars: scala.collection.Set[String])
      : Map[String, Double] = {
    val usedBy = scala.collection.mutable.HashMap
      .empty[String, scala.collection.mutable.ArrayBuffer[Int]]
    val wordLP = new Array[Double](words.length)
    for (i <- words.indices) {
      val (segs, lp) = viterbi(words(i).cps, vocab, maxPieceLen)
      wordLP(i) = lp
      for (p <- segs if !chars.contains(p))
        usedBy.getOrElseUpdate(p,
          scala.collection.mutable.ArrayBuffer.empty[Int]) += i
    }
    val prunable = vocab.keysIterator.filterNot(chars.contains).toArray
    val loss = prunable.map { p =>
      val users = usedBy.getOrElse(p, null)
      if (users == null) p -> 0.0
      else {
        val without = vocab - p
        var l = 0.0
        for (i <- users) {
          val (_, lp2) = viterbi(words(i).cps, without, maxPieceLen)
          l += words(i).count * (wordLP(i) -
            (if (lp2.isNegInfinity) UnkLogP * words(i).n else lp2))
        }
        p -> l
      }
    }
    val nMulti = math.max(0, keep - chars.size)
    val kept = loss.sortBy { case (p, l) => (-l, p) }.take(nMulti)
      .map(_._1).toSet
    vocab.filter { case (p, _) => chars.contains(p) || kept.contains(p) }
  }

  /** Best segmentation of a (boundary-prefixed) word: max-probability
    * split under the piece model, with the [[UnkLogP]] single-char
    * fallback so every input segments. Left-longest on exact ties via
    * strict `>` acceptance over increasing j. */
  def viterbi(cps: Array[String], vocab: Map[String, Double],
      maxPieceLen: Int): (Array[String], Double) = {
    val n = cps.length
    val best = Array.fill(n + 1)(Double.NegativeInfinity)
    val back = Array.fill(n + 1)(-1)
    best(0) = 0.0
    var i = 0
    while (i < n) {
      if (!best(i).isNegInfinity) {
        val sb = new StringBuilder
        var j = i
        while (j < n && j - i < maxPieceLen) {
          sb.append(cps(j))
          val lp = vocab.getOrElse(sb.toString,
            if (j == i) UnkLogP else Double.NegativeInfinity)
          if (!lp.isNegInfinity && best(i) + lp > best(j + 1)) {
            best(j + 1) = best(i) + lp
            back(j + 1) = i
          }
          j += 1
        }
      }
      i += 1
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var at = n
    while (at > 0) {
      val from = back(at)
      out += cps.slice(from, at).mkString
      at = from
    }
    (out.reverseIterator.toArray, best(n))
  }

  private[text] def outputSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("u_tokens", ArrayType(StringType)),
      StructField("u_n_tokens", LongType)))
}

class UnigramTokenizerModel(override val uid: String)
    extends Model[UnigramTokenizerModel] with HasInputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("UnigramTokenizerModel"))

  /** Trained (piece, logP), piece-asc. */
  var pieces: Array[(String, Double)] = Array.empty

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val bc = df.sparkSession.sparkContext.broadcast(pieces.toMap)
    val bid = bc.id
    val maxLen = math.max(1,
      if (pieces.isEmpty) 1
      else pieces.iterator.map(p => p._1.codePointCount(0, p._1.length)).max)
    val enc = udf { toks: Seq[String] =>
      val memo = UnigramTokenizerModel.encodeMemo
      val vocab = bc.value
      toks.flatMap { w =>
        val key = (bid, w)
        val cached = memo.get(key)
        if (cached != null) cached
        else {
          val s = Unigram.viterbi(
            Unigram.WB.concat(w).codePoints().toArray
              .map(cp => new String(Character.toChars(cp))),
            vocab, maxLen)._1
          if (memo.size >= UnigramTokenizerModel.MemoCap) memo.clear()
          memo.put(key, s)
          s
        }
      }
    }
    df.withColumn("u_tokens", enc(UnigramLM.tokens(col(getInputCol))))
      .withColumn("u_n_tokens", size(col("u_tokens")).cast("long"))
  }

  /** Inverse of the encoding: concatenate pieces, boundary marks become
    * spaces — reconstructs the canonical text exactly. */
  def decode(tokens: Column): Column =
    trim(regexp_replace(array_join(tokens, ""),
      java.util.regex.Pattern.quote(Unigram.WB), " "))

  override def transformSchema(schema: StructType): StructType =
    Unigram.outputSchema(schema)
  override def copy(extra: ParamMap): UnigramTokenizerModel = {
    val c = new UnigramTokenizerModel(uid)
    c.pieces = pieces
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(UnigramTokenizerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(UnigramTokenizerModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/pieces.bin", pieces)
      }
    }
}

object UnigramTokenizerModel
    extends org.apache.spark.ml.util.MLReadable[UnigramTokenizerModel] {
  /** Executor-wide encode cache, keyed by broadcast id — same bound and
    * clear-on-full policy as [[BPETokenizerModel.encodeMemo]]. */
  private[text] val MemoCap = 262144
  private[text] val encodeMemo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Array[String]]()
  override def read: org.apache.spark.ml.util.MLReader[UnigramTokenizerModel] =
    new org.apache.spark.ml.util.MLReader[UnigramTokenizerModel] {
      override def load(path: String): UnigramTokenizerModel = {
        val m = new UnigramTokenizerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.pieces = graft.core.ModelIO
          .readObject[Array[(String, Double)]](sparkSession, s"$path/pieces.bin")
        m
      }
    }
}
