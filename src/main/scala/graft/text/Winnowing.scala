package graft.text

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
  * algorithm). Each document yields the set of (position, hash) pairs
  * selected by sliding a `window`-wide window over its character
  * `k`-gram hashes and keeping each window's minimum (rightmost
  * occurrence on ties — the paper's rule). The guarantee: any shared
  * substring of length ≥ k + window − 1 between two documents produces
  * at least one identical fingerprint, while expected density is only
  * 2/(window+1) — the standard local, position-aware alternative to
  * MinHash when "which span matched" matters (plagiarism/provenance).
  *
  * Spark-first shape: the whole computation is per-document and built
  * ENTIRELY from codegen'd expressions — `transform(sequence(...))`
  * over gram positions, `md5` gram hashes, `slice`/`array_min` window
  * minima — no UDF, no shuffle beyond whatever the caller does with the
  * result. Per-doc cost is O(len · window) string compares;
  * the O(len) monotonic-queue variant needs an opaque UDF and loses
  * whole-stage codegen, a poor trade at the small windows (4–16) the
  * paper prescribes. Hashes are md5 hex strings compared in binary
  * order — deterministic, and replayable verbatim in the DuckDB oracle.
  *
  * Documents shorter than k characters yield no fingerprints; documents
  * with fewer than `window` grams yield the single minimum over all
  * their grams (the degenerate one-window case).
  */
class DocumentFingerprinter(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("DocumentFingerprinter"))

  final val k = new IntParam(this, "k",
    "character k-gram length (noise threshold: matches shorter than k " +
      "are never detected)", ParamValidators.gt(0))
  setDefault(k -> 9)
  def setK(v: Int): this.type = set(k, v)
  final val window = new IntParam(this, "window",
    "winnowing window in grams (guarantee threshold t = k + window - 1)",
    ParamValidators.gt(0))
  setDefault(window -> 4)
  def setWindow(v: Int): this.type = set(window, v)
  final val outputCol = new Param[String](this, "outputCol",
    "fingerprint array column: array<struct<pos int, hash string>>, " +
      "1-indexed gram positions, distinct, pos-ascending")
  setDefault(outputCol -> "fingerprints")
  def setOutputCol(v: String): this.type = set(outputCol, v)

  /** Canonical text: lowercased, whitespace runs collapsed to single
    * spaces — the same normalization every corpus operator applies, so
    * fingerprints survive reflow/case edits (the paper's motivation). */
  private def canon(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val kk = $(k)
    val w = $(window)
    // sequence(1, stop) REVERSES for stop < 1 (negative step inference),
    // so sub-k documents must short-circuit to an empty array explicitly
    def seq1(stop: Column): Column =
      when(stop >= 1, sequence(lit(1), stop))
        .otherwise(array().cast(ArrayType(IntegerType)))
    // Lambda-bind the canon text and the hash array through single-
    // element-array transforms so each evaluates ONCE per row. Passing
    // the raw expressions into the per-gram / per-window lambdas would
    // re-evaluate them per element — the O(len²) re-inlining trap this
    // codebase documents at wordNGrams (the optimizer offers no CSE
    // inside lambda bodies, and project collapse re-inlines even
    // materialized columns used once).
    def bind1(e: Column)(f: Column => Column): Column =
      element_at(transform_(array(e), f), 1)
    val fps = bind1(canon(col(getInputCol))) { t =>
      val m = length(t) - kk + 1 // gram count
      bind1(transform_(seq1(m), p => md5(substring_(t, p, kk)))) { hashes =>
        // window starts: 1 .. max(1, m-w+1); the final window clips to
        // the array end only in the degenerate m < w case
        val starts = seq1(greatest(m - w + 1, least(m, lit(1))))
        transform_(starts, q => {
          val win = slice(hashes, q, lit(w))
          val mh = array_min(win)
          // rightmost occurrence of the minimum (paper's tie rule):
          // first position in the REVERSED window, mapped back
          val rpos = array_position(reverse(win), mh)
          struct((q + size(win) - rpos.cast(IntegerType)).as("pos"),
            mh.as("hash"))
        })
      }
    }
    df.withColumn($(outputCol), array_sort(array_distinct(fps)))
  }

  // local aliases: transform/substring collide with Transformer members
  private def transform_(c: Column, f: Column => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)
  private def substring_(c: Column, pos: Column, len: Int): Column =
    c.substr(pos, lit(len))

  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), ArrayType(
      StructType(Seq(StructField("pos", IntegerType),
        StructField("hash", StringType))))))
  override def copy(extra: ParamMap): DocumentFingerprinter = defaultCopy(extra)
}
object DocumentFingerprinter
  extends GraftReadable[DocumentFingerprinter]
