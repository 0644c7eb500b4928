package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** The full Gopher repetition-removal signal set (Rae et al. 2021,
  * "Scaling Language Models: ... Gopher", Table A1 — the filters
  * RefinedWeb, FineWeb and Dolma reuse): per document,
  *
  *  - duplicate LINE fraction and the fraction of document characters
  *    inside duplicated lines (lines = newline-split, trimmed,
  *    blank-dropped); same pair for PARAGRAPHS (blank-line-separated,
  *    i.e. split on 2+ consecutive newlines). Duplicates are counted
  *    EXCLUDING each group's first occurrence — `x,y,x` scores 1/3,
  *    the datatrove/Dolma `find_duplicates` convention the published
  *    thresholds were calibrated against (an all-members count scores
  *    2/3 and silently over-filters at the same thresholds);
  *  - TOP n-gram character fraction for n in {2,3,4}: occurrences of
  *    the single most frequent word n-gram times that gram's character
  *    length — inner spaces included, the ecosystem's
  *    `len(" ".join(gram)) * count` — over total DOCUMENT characters
  *    (ties broken toward the codepoint-smallest gram so the statistic
  *    is deterministic — matches binary-collation `ORDER BY` in the
  *    SQL replay);
  *  - DUPLICATE n-gram character fraction for n in {5..10}: characters
  *    of words covered by any n-gram that occurs more than once,
  *    counting each covered word position ONCE even under overlapping
  *    occurrences (the paper's "taking care not to count characters
  *    ... more than once", which is also Dolma's coverage-mask rule),
  *    over total document characters.
  *
  * Semantics note (round 14): fractions follow the de-facto public
  * implementations of the rule (datatrove/FineWeb, Dolma) — exclude-
  * first duplicate counting and whole-document-character denominators
  * — so [[GopherQualityFilter]]'s paper-default thresholds filter at
  * ecosystem parity. Two deliberate residual divergences, both
  * documented rather than replicated: (a) lines/paragraphs are trimmed
  * and blank-dropped before duplicate counting (blank runs are
  * structure, not repeated content; datatrove keeps raw splits), and
  * (b) the dup-n-gram numerator counts covered WORD characters, not
  * the spaces between covered words (Dolma's character mask includes
  * them; datatrove instead counts non-overlapping space-free joins) —
  * strictly smaller by at most the inter-word spaces, i.e. marginally
  * more lenient, never stricter.
  *
  * All fractions are emitted q4-scaled (`floor(x*10000+0.5)` as long,
  * 0 when the denominator is 0) — the library's convention for
  * hash-stable fraction columns. [[RepetitionProfiler]] remains the
  * cheap native-expression subset (dup-word + 2-gram stats); this
  * transformer is the complete removal-rule input.
  *
  * Scale shape: per-document one-pass UDF — a narrow projection, no
  * shuffle, no explode; scan splits are the parallelism source. Inside
  * the row the pass is O(words) per gram order (hash-map counts + a
  * boolean coverage array for the overlap rule), ~O(54·words) total
  * across the nine orders. The builtin-expression formulation was
  * rejected for exactly this operator class in round 12 (winnowing
  * sweep: 16.7x allocation/GC tax when the operator IS the kernel —
  * SCALING.md round-12 tranche 3).
  *
  * Tokenization spec (shared with the SQL oracle): words = whitespace
  * runs split on `\s+` after trim, empties dropped — the RE2∩Java
  * regex subset, same as [[HtmlText]]. Character counts are Unicode
  * codepoints (not UTF-16 units), so they agree with DuckDB `len()`.
  */
class GopherRepetition(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("GopherRepetition"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val profUdf = udf { text: String => GopherRepetition.profile(text) }
    val tmp = graft.core.DatasetExtensions
      .findUnusedColumnName("gr_profile", ds.schema)
    // one projection for all sixteen fields, not a withColumn fold:
    // each withColumn re-analyzes the whole plan, and sixteen re-walks
    // were measured as driver-side seconds when the upstream expression
    // tree is large (SCALING.md round 13). The tmp struct column keeps
    // the UDF evaluated once; not re-selecting it is the drop.
    val base = ds.toDF()
    // replace semantics on re-application (withColumn's old behavior):
    // pre-existing gr_* columns are superseded, not duplicated
    base.withColumn(tmp, profUdf(col(getInputCol)))
      .select(base.columns.toIndexedSeq
          .filterNot(GopherRepetition.fields.map(_._1).toSet).map(col) ++
        GopherRepetition.fields.map { case (outName, fieldName) =>
          col(tmp).getField(fieldName).as(outName)
        }: _*)
  }

  override def transformSchema(schema: StructType): StructType = {
    // mirror transform's replace semantics on re-application
    val outs = GopherRepetition.fields.map(_._1)
    StructType(schema.filterNot(f => outs.contains(f.name)) ++
      outs.map(StructField(_, LongType)))
  }
  override def copy(extra: ParamMap): GopherRepetition = defaultCopy(extra)
}

object GopherRepetition extends GraftReadable[GopherRepetition] {

  /** output column -> Profile field, in emission order */
  val fields: Seq[(String, String)] = Seq(
    "gr_n_lines" -> "nLines",
    "gr_dup_line_q4" -> "dupLineQ4",
    "gr_dup_line_char_q4" -> "dupLineCharQ4",
    "gr_n_paras" -> "nParas",
    "gr_dup_para_q4" -> "dupParaQ4",
    "gr_dup_para_char_q4" -> "dupParaCharQ4",
    "gr_n_words" -> "nWords",
    "gr_top_2gram_char_q4" -> "top2Q4",
    "gr_top_3gram_char_q4" -> "top3Q4",
    "gr_top_4gram_char_q4" -> "top4Q4",
    "gr_dup_5gram_char_q4" -> "dup5Q4",
    "gr_dup_6gram_char_q4" -> "dup6Q4",
    "gr_dup_7gram_char_q4" -> "dup7Q4",
    "gr_dup_8gram_char_q4" -> "dup8Q4",
    "gr_dup_9gram_char_q4" -> "dup9Q4",
    "gr_dup_10gram_char_q4" -> "dup10Q4")

  case class Profile(
      nLines: Long, dupLineQ4: Long, dupLineCharQ4: Long,
      nParas: Long, dupParaQ4: Long, dupParaCharQ4: Long,
      nWords: Long,
      top2Q4: Long, top3Q4: Long, top4Q4: Long,
      dup5Q4: Long, dup6Q4: Long, dup7Q4: Long,
      dup8Q4: Long, dup9Q4: Long, dup10Q4: Long)

  private val Zero =
    Profile(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)

  private def q4(num: Long, den: Long): Long =
    if (den > 0) math.floor(num.toDouble / den.toDouble * 10000.0 + 0.5).toLong
    else 0L

  private def cpLen(s: String): Long =
    s.codePointCount(0, s.length).toLong

  /** Codepoint-order comparison — equals DuckDB's binary VARCHAR
    * collation (UTF-8 byte order), unlike String.compareTo which is
    * UTF-16-unit order and disagrees on supplementary characters. */
  private def cpCompare(a: String, b: String): Int = {
    var i = 0; var j = 0
    while (i < a.length && j < b.length) {
      val ca = a.codePointAt(i); val cb = b.codePointAt(j)
      if (ca != cb) return Integer.compare(ca, cb)
      i += Character.charCount(ca); j += Character.charCount(cb)
    }
    Integer.compare(a.length - i, b.length - j)
  }

  /** (count, dupCount, dupChars) over a trimmed, blank-dropped item
    * list — the line/paragraph measure. Duplicates exclude each
    * group's FIRST occurrence (a group of c copies contributes c-1),
    * the datatrove/Dolma `find_duplicates` convention. */
  private def dupStats(items: Array[String]): (Long, Long, Long) = {
    val counts = new java.util.HashMap[String, Int](items.length * 2)
    items.foreach(s => counts.put(s, counts.getOrDefault(s, 0) + 1))
    var dupC = 0L; var dupChars = 0L
    val it = counts.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val c = e.getValue
      if (c > 1) { dupC += c - 1; dupChars += (c - 1) * cpLen(e.getKey) }
    }
    (items.length.toLong, dupC, dupChars)
  }

  def profile(text: String): Profile = {
    if (text == null) return Zero
    // SPACE-only trim (GopherStructural.spaceTrim), not Java String.trim:
    // the DuckDB oracle's trim(l) strips spaces only, and GopherSignals'
    // line census uses the same rule — Java trim would also strip \t/\r,
    // so CRLF crawl text would count 'a\r' and 'a' as one line here but
    // two in the oracle (caught by round-13 review; suite-pinned below)
    val lines = text.split("\n", -1).map(GopherStructural.spaceTrim)
      .filter(_.nonEmpty)
    val (nl, lDup, lDupChars) = dupStats(lines)
    val paras = text.split("\n{2,}", -1).map(GopherStructural.spaceTrim)
      .filter(_.nonEmpty)
    val (np, pDup, pDupChars) = dupStats(paras)
    // char-fraction denominator = the WHOLE document's codepoints (the
    // ecosystem's len(text)), not the sum of item/word characters
    val docChars = cpLen(text)
    val words = text.trim.split("\\s+").filter(_.nonEmpty)
    val nW = words.length
    val wLen = words.map(cpLen)

    // most-frequent n-gram's occurrences × its characters (spaces
    // included — the gram string as joined)
    def topQ4(n: Int): Long = {
      val m = nW - n + 1
      if (m < 1 || docChars == 0) return 0L
      val counts = new java.util.HashMap[String, Int](m * 2)
      var i = 0
      while (i < m) {
        val g = words.slice(i, i + n).mkString(" ")
        counts.put(g, counts.getOrDefault(g, 0) + 1)
        i += 1
      }
      var bestG: String = null; var bestC = 0
      val it = counts.entrySet().iterator()
      while (it.hasNext) {
        val e = it.next()
        val g = e.getKey; val c = e.getValue
        if (c > bestC || (c == bestC && cpCompare(g, bestG) < 0)) {
          bestG = g; bestC = c
        }
      }
      q4(bestC.toLong * cpLen(bestG), docChars)
    }

    // characters of word positions covered by any duplicated n-gram,
    // each position counted once (overlap-aware)
    def dupQ4(n: Int): Long = {
      val m = nW - n + 1
      if (m < 1 || docChars == 0) return 0L
      val grams = new Array[String](m)
      val counts = new java.util.HashMap[String, Int](m * 2)
      var i = 0
      while (i < m) {
        val g = words.slice(i, i + n).mkString(" ")
        grams(i) = g
        counts.put(g, counts.getOrDefault(g, 0) + 1)
        i += 1
      }
      val covered = new Array[Boolean](nW)
      i = 0
      while (i < m) {
        if (counts.get(grams(i)) > 1) {
          var j = i
          while (j < i + n) { covered(j) = true; j += 1 }
        }
        i += 1
      }
      var dch = 0L; i = 0
      while (i < nW) { if (covered(i)) dch += wLen(i); i += 1 }
      q4(dch, docChars)
    }

    Profile(
      nl, q4(lDup, nl), q4(lDupChars, docChars),
      np, q4(pDup, np), q4(pDupChars, docChars),
      nW.toLong,
      topQ4(2), topQ4(3), topQ4(4),
      dupQ4(5), dupQ4(6), dupQ4(7), dupQ4(8), dupQ4(9), dupQ4(10))
  }
}
