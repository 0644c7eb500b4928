package graft.text

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Top-fraction selection by a per-document score — the "keep the best
  * f of the corpus by LM perplexity / classifier probability / quality
  * signal" pruning stage every data recipe ends with.
  *
  * Two modes, one semantics knob apart:
  *  - `approx` (default, the 100 TB path): the keep threshold is the
  *    (1-f) quantile from `approxQuantile` (Greenwald-Khanna sketch, one
  *    pass, driver state bounded by 1/approxError); the filter is then a
  *    NARROW pass. Kept mass is f ± approxError for near-continuous
  *    scores; HEAVILY TIED discrete scores (e.g. integer lengths) keep
  *    every row tied at the threshold, so the kept mass can exceed f by
  *    the tied mass — use exact mode when ties matter. fraction = 0.0
  *    short-circuits to an empty result (matching exact mode's ceil(0·n)
  *    = 0 rows; the quantile of the empty request would otherwise be the
  *    max score, whose >= filter keeps all max-tied rows).
  *  - `exact`: ties broken (score desc, id asc) through a global
  *    row_number — exactly ceil(f·n) rows survive, deterministically.
  *    The global window is a single-partition sort: correct at any size
  *    but serialized — this mode exists for verification and modest
  *    corpora, and is the driver gate's SQL-replayable path. (A
  *    distributed exact selection would range-partition on score and
  *    binary-search the boundary partition; approx-with-small-error
  *    makes that machinery pointless in practice.)
  */
class ScoreSelector(override val uid: String) extends Transformer
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ScoreSelector"))

  final val scoreCol = new Param[String](this, "scoreCol",
    "numeric score column; higher is better")
  def setScoreCol(v: String): this.type = set(scoreCol, v)
  final val idCol = new Param[String](this, "idCol",
    "unique id column (exact-mode tie-break)")
  setDefault(idCol -> "doc_id")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val fraction = new DoubleParam(this, "fraction",
    "target kept fraction", ParamValidators.inRange(0.0, 1.0))
  setDefault(fraction -> 0.5)
  def setFraction(v: Double): this.type = set(fraction, v)
  final val mode = new Param[String](this, "mode",
    "'approx' (quantile sketch threshold, narrow) or 'exact' " +
      "(deterministic global rank)",
    ParamValidators.inArray(Array("approx", "exact")))
  setDefault(mode -> "approx")
  def setMode(v: String): this.type = set(mode, v)
  final val approxError = new DoubleParam(this, "approxError",
    "approx mode: quantile sketch relative error",
    ParamValidators.inRange(0.0, 1.0))
  setDefault(approxError -> 0.001)
  def setApproxError(v: Double): this.type = set(approxError, v)
  /** Optional stratification: the fraction is kept PER GROUP of this
    * column (per-domain / per-language pruning). Exact mode's window
    * then partitions by it — parallel across groups, so the
    * single-partition-sort caveat applies per group, not globally;
    * approx mode computes one sketch threshold per group (hash agg) and
    * joins it back. */
  final val partitionCol = new Param[String](this, "partitionCol",
    "keep the fraction per group of this column")
  def setPartitionCol(v: String): this.type = set(partitionCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    val df = ds.toDF()
    $(mode) match {
      // exact mode keeps ceil(0·n) = 0 rows; approx's >=-threshold
      // filter cannot express "none", so short-circuit
      case "approx" if $(fraction) == 0.0 => df.limit(0)
      case "approx" if isSet(partitionCol) =>
        val acc = math.max(100L,
          math.ceil(1.0 / $(approxError)).toLong)
        val thr = df.groupBy(col($(partitionCol)))
          .agg(percentile_approx(col($(scoreCol)).cast("double"),
            lit(1.0 - $(fraction)), lit(acc)).as("__sel_thr"))
        df.join(broadcast(thr), Seq($(partitionCol)))
          .filter(col($(scoreCol)).cast("double") >= col("__sel_thr"))
          .drop("__sel_thr")
      case "approx" =>
        val q = 1.0 - $(fraction)
        val thr = df.stat.approxQuantile($(scoreCol),
          Array(math.min(math.max(q, 0.0), 1.0)), $(approxError))(0)
        df.filter(col($(scoreCol)).cast("double") >= thr)
      case "exact" =>
        val parts =
          if (isSet(partitionCol)) Seq(col($(partitionCol))) else Seq.empty
        val w = Window.partitionBy(parts: _*)
          .orderBy(col($(scoreCol)).desc, col($(idCol)).asc)
        val cw = Window.partitionBy(parts: _*)
        df.withColumn("__sel_rn", row_number().over(w))
          .withColumn("__sel_n", count(lit(1)).over(cw))
          .filter(col("__sel_rn") <= ceil(lit($(fraction)) * col("__sel_n")))
          .drop("__sel_rn", "__sel_n")
    }
  }
  override def transformSchema(schema: StructType): StructType = {
    // fail at plan-construction time with the role and column named
    // (the fingerprint-family pattern, swept family-wide round 18)
    SchemaChecks.requireCols(schema, "scoreCol" -> $(scoreCol))
    if ($(mode) == "exact")
      SchemaChecks.requireCols(schema, "idCol" -> $(idCol))
    if (isSet(partitionCol))
      SchemaChecks.requireCols(schema, "partitionCol" -> $(partitionCol))
    // __sel_rn/__sel_n are written onto the input frame (exact mode);
    // __sel_thr anchors the joined-threshold filter (approx per-group)
    SchemaChecks.requireAbsent(schema, "__sel_rn", "__sel_n", "__sel_thr")
    schema
  }
  override def copy(extra: ParamMap): ScoreSelector = defaultCopy(extra)
}
object ScoreSelector extends graft.core.GraftReadable[ScoreSelector]
