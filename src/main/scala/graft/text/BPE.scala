package graft.text

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding subword tokenizer, trained the way Sennrich et al.
  * 2016 ("Neural Machine Translation of Rare Words with Subword Units")
  * actually trains it: on a WORD-FREQUENCY DICTIONARY, not the running
  * corpus. That construction is what makes BPE learnable at 100 TB —
  * the corpus contributes exactly ONE map-side-combined word-count
  * aggregation with a bounded top-K collect (`maxWordTypes` by
  * (count desc, word asc) — deterministic), and the greedy merge loop
  * then runs driver-side over at most that many word types, costing
  * O(types · word length) per merge regardless of corpus size.
  *
  * Words are canonical corpus tokens ([[UnigramLM.tokens]]: lowercase,
  * whitespace split) decomposed into code points plus a terminal
  * end-of-word symbol; each merge joins the globally most frequent
  * adjacent symbol pair (count desc, pair asc on ties — deterministic)
  * and stops early when no pair repeats. Encoding applies merges by
  * rank (lowest rank first — the standard apply rule, which reproduces
  * the training segmentation); a bounded per-executor memo makes the
  * common-word path a map lookup. Decoding concatenates symbols and
  * turns end-of-word markers back into spaces, so
  * `decode(encode(text))` reconstructs the canonical text EXACTLY —
  * the tokenizer's losslessness contract and its driver gate.
  */
class BPETokenizer(override val uid: String)
    extends Estimator[BPETokenizerModel] with HasInputCol
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("BPETokenizer"))

  final val numMerges = new IntParam(this, "numMerges",
    "maximum merge operations to learn", ParamValidators.gt(0))
  setDefault(numMerges -> 8192)
  def setNumMerges(v: Int): this.type = set(numMerges, v)
  final val maxWordTypes = new IntParam(this, "maxWordTypes",
    "top-K word types (count desc, word asc) the merge loop sees; rare " +
      "tail types fall back to merge-rank encoding", ParamValidators.gt(0))
  setDefault(maxWordTypes -> 65536)
  def setMaxWordTypes(v: Int): this.type = set(maxWordTypes, v)

  override def fit(ds: Dataset[_]): BPETokenizerModel = {
    import BPE._
    val dict: Array[(String, Long)] = ds.toDF()
      .select(explode(UnigramLM.tokens(col(getInputCol))).as("__w"))
      .groupBy("__w").agg(count(lit(1)).as("__c"))
      .orderBy(col("__c").desc, col("__w").asc)
      .limit($(maxWordTypes)).collect()
      .map(r => r.getString(0) -> r.getLong(1))
    val m = new BPETokenizerModel(uid + "_model").setInputCol(getInputCol)
    m.merges = learnMerges(dict, $(numMerges))
    m
  }
  override def transformSchema(schema: StructType): StructType =
    BPE.outputSchema(schema)
  override def copy(extra: ParamMap): BPETokenizer = defaultCopy(extra)
}
object BPETokenizer extends graft.core.GraftReadable[BPETokenizer]

object BPE {
  /** End-of-word marker symbol (Sennrich's `</w>`). Documents containing
    * the literal marker would decode with an extra space — the standard
    * construction's known limitation, inherited knowingly. */
  val EOW = "</w>"

  /** Greedy merge learning over a word-frequency dictionary.
    *
    * Incremental trainer (the standard learn_bpe optimization): pair
    * counts and a pair->word-index occurrence index are built once;
    * each merge re-counts ONLY the words containing the merged pair, so
    * a merge costs O(affected words · word length), not
    * O(types · word length). Selection rides a lazy-deletion max-heap
    * — every count change pushes a fresh (count, pair) entry, stale
    * entries are discarded on pop — preserving the exact deterministic
    * order of the full-rescan formulation: count desc, pair asc.
    */
  def learnMerges(dict: Array[(String, Long)],
      numMerges: Int): Array[(String, String)] = {
    val words: Array[(Array[String], Long)] =
      dict.map { case (w, c) => (symbols(w), c) }
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.HashSet[Int]]
    // max under this ordering = highest count, then lexicographically
    // smallest pair — the old minBy((-c, a, b)) selection
    val heapOrd: Ordering[(Long, String, String)] =
      new Ordering[(Long, String, String)] {
        def compare(x: (Long, String, String), y: (Long, String, String)): Int = {
          val c = java.lang.Long.compare(x._1, y._1)
          if (c != 0) c
          else {
            val a = y._2.compareTo(x._2)
            if (a != 0) a else y._3.compareTo(x._3)
          }
        }
      }
    val heap = scala.collection.mutable.PriorityQueue.empty(heapOrd)
    def bump(p: (String, String), delta: Long, wordIdx: Int): Unit = {
      val n = counts.getOrElse(p, 0L) + delta
      if (n <= 0L) counts.remove(p) else counts(p) = n
      if (delta > 0 && wordIdx >= 0)
        where.getOrElseUpdate(p,
          scala.collection.mutable.HashSet.empty[Int]) += wordIdx
      if (n > 0L) heap.enqueue((n, p._1, p._2))
    }
    for (i <- words.indices) {
      val (syms, c) = words(i)
      var j = 0
      while (j < syms.length - 1) {
        bump((syms(j), syms(j + 1)), c, i); j += 1
      }
    }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var continue = true
    while (continue && merges.length < numMerges) {
      // pop to the first LIVE entry (count matches the current map)
      var best: (String, String) = null
      var bestC = 0L
      while (best == null && heap.nonEmpty) {
        val (cnt, a, b) = heap.dequeue()
        if (counts.getOrElse((a, b), 0L) == cnt) { best = (a, b); bestC = cnt }
      }
      // a pair occurring once buys nothing: merging it cannot shorten
      // any future encoding that matters — the classic stop rule
      if (best == null || bestC < 2) continue = false
      else {
        merges += best
        val (a, b) = best
        // the occurrence index may hold stale word ids (pairs vanish
        // when a neighbor merges); containment is re-checked per word
        val idxs = where.getOrElse(best, scala.collection.mutable.HashSet
          .empty[Int]).toArray.sorted
        for (i <- idxs) {
          val (syms, c) = words(i)
          var has = false
          var j = 0
          while (!has && j < syms.length - 1) {
            has = syms(j) == a && syms(j + 1) == b; j += 1
          }
          if (has) {
            j = 0
            while (j < syms.length - 1) {
              bump((syms(j), syms(j + 1)), -c, -1); j += 1
            }
            val ns = mergePair(syms, a, b)
            words(i) = (ns, c)
            j = 0
            while (j < ns.length - 1) {
              bump((ns(j), ns(j + 1)), c, i); j += 1
            }
          }
        }
        counts.remove(best)
        where.remove(best)
      }
    }
    merges.toArray
  }

  /** Code-point symbols of a word plus the terminal marker (code points,
    * not UTF-16 units, so astral-plane characters stay whole). */
  def symbols(w: String): Array[String] = {
    val cps = w.codePoints().toArray
    val out = new Array[String](cps.length + 1)
    var i = 0
    while (i < cps.length) {
      out(i) = new String(Character.toChars(cps(i))); i += 1
    }
    out(cps.length) = EOW
    out
  }

  /** One merge pass: every adjacent (a, b) occurrence becomes a+b,
    * left-to-right (matching the training scan). */
  def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i < syms.length - 1 && syms(i) == a && syms(i + 1) == b) {
        out += a + b; i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Standard rank-greedy apply: repeatedly merge the present pair with
    * the lowest training rank until none remains. Reproduces the
    * training segmentation for dictionary words. */
  def applyMerges(word: String, rank: Map[(String, String), Int]): Array[String] = {
    var syms = symbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var bestRank = Int.MaxValue
      var bestAt = -1
      var i = 0
      while (i < syms.length - 1) {
        rank.get((syms(i), syms(i + 1))) match {
          case Some(r) if r < bestRank => bestRank = r; bestAt = i
          case _ => ()
        }
        i += 1
      }
      if (bestAt < 0) continue = false
      else {
        val (a, b) = (syms(bestAt), syms(bestAt + 1))
        syms = mergePair(syms, a, b)
      }
    }
    syms
  }

  private[text] def outputSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("bpe_tokens", ArrayType(StringType)),
      StructField("bpe_n_tokens", LongType)))
}

class BPETokenizerModel(override val uid: String)
    extends Model[BPETokenizerModel] with HasInputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("BPETokenizerModel"))

  /** Learned merge operations in training order (rank = index). */
  var merges: Array[(String, String)] = Array.empty

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val bcRank = df.sparkSession.sparkContext
      .broadcast(merges.iterator.zipWithIndex
        .map { case (p, i) => p -> i }.toMap)
    // per-executor memo (companion-object static, so every task in the
    // executor JVM shares it — a closure-captured map would deserialize
    // per task); keyed by the rank table's broadcast id so distinct
    // models never cross-contaminate
    val bid = bcRank.id
    val enc = udf { toks: Seq[String] =>
      val memo = BPETokenizerModel.encodeMemo
      val rank = bcRank.value
      toks.flatMap { w =>
        val key = (bid, w)
        val cached = memo.get(key)
        if (cached != null) cached
        else {
          val s = BPE.applyMerges(w, rank)
          if (memo.size >= BPETokenizerModel.MemoCap) memo.clear()
          memo.put(key, s)
          s
        }
      }
    }
    df.withColumn("bpe_tokens", enc(UnigramLM.tokens(col(getInputCol))))
      .withColumn("bpe_n_tokens", size(col("bpe_tokens")).cast("long"))
  }

  /** Inverse of the encoding: concatenate symbols, end-of-word markers
    * become spaces — reconstructs the canonical (lowercased,
    * space-normalized) text exactly. */
  def decode(tokens: Column): Column =
    trim(array_join(org.apache.spark.sql.functions.transform(tokens,
      (t: Column) =>
        regexp_replace(t, java.util.regex.Pattern.quote(BPE.EOW), " ")),
      ""))

  override def transformSchema(schema: StructType): StructType =
    BPE.outputSchema(schema)
  override def copy(extra: ParamMap): BPETokenizerModel = {
    val c = new BPETokenizerModel(uid)
    c.merges = merges
    copyValues(c, extra)
  }
  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(BPETokenizerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(BPETokenizerModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/merges.bin", merges)
      }
    }
}

object BPETokenizerModel
    extends org.apache.spark.ml.util.MLReadable[BPETokenizerModel] {
  /** Executor-wide encode cache: common words dominate any natural
    * corpus, so the segmentation is usually one map lookup. Bounded by
    * [[MemoCap]] total entries across all live models (clear-on-full:
    * a refill costs one [[BPE.applyMerges]] per word type — cheap
    * relative to unbounded growth on adversarial vocabulary). */
  private[text] val MemoCap = 262144
  private[text] val encodeMemo =
    new java.util.concurrent.ConcurrentHashMap[(Long, String), Array[String]]()
  override def read: org.apache.spark.ml.util.MLReader[BPETokenizerModel] =
    new org.apache.spark.ml.util.MLReader[BPETokenizerModel] {
      override def load(path: String): BPETokenizerModel = {
        val m = new BPETokenizerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.merges = graft.core.ModelIO
          .readObject[Array[(String, String)]](sparkSession, s"$path/merges.bin")
        m
      }
    }
}
