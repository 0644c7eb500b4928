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
  * Scale design: ONE aggregation job computes every enabled statistic for
  * every column (a single wide `agg` — map-side combinable, no per-column
  * jobs), then the tiny |columns|-row result is reshaped driver-side.
  * Quantiles use `percentile_approx` (GK sketch) inside the same pass
  * instead of the reference's separate `approxQuantile` calls.
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

  private def pct: Double =
    if ($(errorThreshold) <= 0) 1e-4 else $(errorThreshold)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val numeric = df.schema.fields
      .filter(_.dataType.isInstanceOf[NumericType]).map(_.name)
    val allCols = df.schema.fieldNames

    // one wide aggregation over every column
    val aggExprs = allCols.flatMap { c =>
      val base = Seq(
        count(col(c)).as(s"${c}__count"),
        (if ($(exactUnique)) count_distinct(col(c))
         else approx_count_distinct(col(c))).as(s"${c}__unique"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__missing"))
      val quant = if (numeric.contains(c)) Seq(
        min(col(c)).cast("double").as(s"${c}__min"),
        percentile_approx(col(c), lit(0.25), lit((1 / pct).toInt)).cast("double").as(s"${c}__q1"),
        percentile_approx(col(c), lit(0.5), lit((1 / pct).toInt)).cast("double").as(s"${c}__median"),
        percentile_approx(col(c), lit(0.75), lit((1 / pct).toInt)).cast("double").as(s"${c}__q3"),
        max(col(c)).cast("double").as(s"${c}__max")) else Nil
      val moments = if (numeric.contains(c)) Seq(
        avg(col(c)).as(s"${c}__mean"),
        variance(col(c)).as(s"${c}__variance"),
        stddev(col(c)).as(s"${c}__stddev"),
        skewness(col(c)).as(s"${c}__skewness"),
        kurtosis(col(c)).as(s"${c}__kurtosis")) else Nil
      (if ($(computeCounts)) base else Nil) ++
        (if ($(computeBasic)) quant else Nil) ++
        (if ($(computeSample)) moments else Nil)
    }
    require(aggExprs.nonEmpty, "SummarizeData: nothing to compute")
    val row = df.agg(aggExprs.head, aggExprs.tail.toIndexedSeq: _*).head()

    val statNames =
      (if ($(computeCounts)) Seq("count", "unique", "missing") else Nil) ++
      (if ($(computeBasic)) Seq("min", "q1", "median", "q3", "max") else Nil) ++
      (if ($(computeSample)) Seq("mean", "variance", "stddev", "skewness", "kurtosis") else Nil)
    val fieldIdx = row.schema.fieldNames.zipWithIndex.toMap
    val outRows = allCols.map { c =>
      val vals = statNames.map { s =>
        fieldIdx.get(s"${c}__$s") match {
          case Some(i) if !row.isNullAt(i) =>
            row.get(i) match {
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
