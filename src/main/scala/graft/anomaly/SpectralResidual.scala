package graft.anomaly

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Radix-2 iterative FFT (Cooley-Tukey, standard public construction).
  * In-place over split re/im arrays; inverse via conjugate trick.
  */
object FFT {
  def transform(re: Array[Double], im: Array[Double], inverse: Boolean): Unit = {
    val n = re.length
    require((n & (n - 1)) == 0, s"FFT length must be a power of 2, got $n")
    // bit reversal permutation
    var i = 1; var j = 0
    while (i < n) {
      var bit = n >> 1
      while ((j & bit) != 0) { j ^= bit; bit >>= 1 }
      j |= bit
      if (i < j) {
        val tr = re(i); re(i) = re(j); re(j) = tr
        val ti = im(i); im(i) = im(j); im(j) = ti
      }
      i += 1
    }
    var len = 2
    while (len <= n) {
      val ang = (if (inverse) 2.0 else -2.0) * math.Pi / len
      val wr = math.cos(ang); val wi = math.sin(ang)
      var base = 0
      while (base < n) {
        var cwr = 1.0; var cwi = 0.0
        var k = 0
        while (k < len / 2) {
          val ur = re(base + k); val ui = im(base + k)
          val vr = re(base + k + len / 2) * cwr - im(base + k + len / 2) * cwi
          val vi = re(base + k + len / 2) * cwi + im(base + k + len / 2) * cwr
          re(base + k) = ur + vr; im(base + k) = ui + vi
          re(base + k + len / 2) = ur - vr; im(base + k + len / 2) = ui - vi
          val nwr = cwr * wr - cwi * wi
          cwi = cwr * wi + cwi * wr; cwr = nwr
          k += 1
        }
        base += len
      }
      len <<= 1
    }
    if (inverse) {
      var p = 0
      while (p < n) { re(p) /= n; im(p) /= n; p += 1 }
    }
  }

  def nextPow2(n: Int): Int = {
    var p = 1
    while (p < n) p <<= 1
    p
  }
}

/** Spectral Residual saliency (Ren et al., KDD 2019 "Time-Series Anomaly
  * Detection Service at Microsoft" — the published algorithm behind the
  * reference's DetectAnomalies REST service,
  * cognitive/.../AnomalyDetection.scala:24-249). Computed natively:
  *
  *  1. FFT of the series (zero-padded to a power of 2)
  *  2. spectral residual R = log-amplitude − moving-average(log-amplitude)
  *  3. inverse FFT of exp(R)·phase → saliency map
  *  4. point t is anomalous when
  *     (S(t) − localMean) / localMean > threshold, localMean over the
  *     `scoreWindow` preceding saliency values.
  *
  * Scale design: series are grouped by key and processed independently —
  * `groupByKey.flatMapGroups`, one shuffle on the series key; each group
  * sorts its own points and runs two O(n log n) FFTs. Per-series state is
  * the series itself (time series at 100 TB means MANY series, not one
  * giant one; chunk long series by time window upstream if needed).
  */
class SRAnomalyDetector(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("SRAnomalyDetector"))

  final val orderCol = new Param[String](this, "orderCol",
    "column ordering the series points (e.g. timestamp)")
  def setOrderCol(v: String): this.type = set(orderCol, v)
  final val groupCols = new StringArrayParam(this, "groupCols",
    "series key columns (empty = one global series)")
  setDefault(groupCols -> Array.empty[String])
  def setGroupCols(v: Array[String]): this.type = set(groupCols, v)
  final val avgWindow = new IntParam(this, "avgWindow",
    "log-amplitude moving-average width", ParamValidators.gt(0))
  setDefault(avgWindow -> 3)
  def setAvgWindow(v: Int): this.type = set(avgWindow, v)
  final val scoreWindow = new IntParam(this, "scoreWindow",
    "preceding saliency values in the local mean", ParamValidators.gt(0))
  setDefault(scoreWindow -> 21)
  def setScoreWindow(v: Int): this.type = set(scoreWindow, v)
  final val threshold = new DoubleParam(this, "threshold",
    "relative saliency cutoff (paper default 3)")
  setDefault(threshold -> 3.0)
  def setThreshold(v: Double): this.type = set(threshold, v)

  /** Saliency map of one series (already time-ordered). The series
    * MEDIAN is subtracted before the FFT: the paper (Ren et al. §3.1)
    * extends the series with estimated points specifically to avoid
    * boundary artifacts; with power-of-2 zero-padding the equivalent
    * guard is removing the series level, otherwise the level becomes a
    * step at the padding boundary whose sinc leakage dominates the
    * saliency map and buries genuine point anomalies. Median, not mean:
    * the anomalies themselves must not shift the center (a handful of
    * big spikes drags the mean off the base level, re-creating the very
    * step being removed). */
  def saliency(xs: Array[Double]): Array[Double] = {
    val n = xs.length
    val m = FFT.nextPow2(n)
    val sorted = java.util.Arrays.copyOf(xs, n)
    java.util.Arrays.sort(sorted)
    val center = if (n == 0) 0.0
      else if (n % 2 == 1) sorted(n / 2)
      else (sorted(n / 2 - 1) + sorted(n / 2)) / 2.0
    val re = new Array[Double](m)
    var i0 = 0
    while (i0 < n) { re(i0) = xs(i0) - center; i0 += 1 }
    val im = new Array[Double](m)
    FFT.transform(re, im, inverse = false)
    val amp = Array.tabulate(m)(i => math.sqrt(re(i) * re(i) + im(i) * im(i)))
    val logAmp = amp.map(a => math.log(math.max(a, 1e-8)))
    val q = $(avgWindow)
    // centered moving average with clamped edges
    val avg = Array.tabulate(m) { i =>
      val lo = math.max(0, i - q / 2); val hi = math.min(m - 1, i + q / 2)
      var s = 0.0; var k = lo
      while (k <= hi) { s += logAmp(k); k += 1 }
      s / (hi - lo + 1)
    }
    var i = 0
    while (i < m) {
      val scale =
        if (amp(i) < 1e-8) 0.0 else math.exp(logAmp(i) - avg(i)) / amp(i)
      re(i) *= scale; im(i) *= scale
      i += 1
    }
    FFT.transform(re, im, inverse = true)
    Array.tabulate(n)(t => math.sqrt(re(t) * re(t) + im(t) * im(t)))
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val groups = $(groupCols).toSeq
    val z = $(scoreWindow)
    val tau = $(threshold)
    val outSchema = transformSchema(df.schema)
    val keyed = df.select(
      (concat_ws("",
        groups.map(c => coalesce(col(c).cast("string"), lit(""))): _*).as("__g") +:
        df.columns.toIndexedSeq.map(col)) :+
        col($(orderCol)).cast("double").as("__ord") :+
        col(getInputCol).cast("double").as("__x"): _*)
      // a null value or order would silently unbox to 0.0 in the group
      // closure, injecting phantom points — such rows are not series points
      .filter(col("__x").isNotNull && col("__ord").isNotNull)
    val enc = ExpressionEncoder(outSchema)
    implicit val rowEnc: org.apache.spark.sql.Encoder[Row] = enc
    val nOrig = df.columns.length
    val self = this
    keyed.groupByKey(_.getAs[String]("__g"))(Encoders.STRING)
      .flatMapGroups { (_: String, it: Iterator[Row]) =>
        val rows = it.toArray.sortBy(_.getAs[Double]("__ord"))
        val xs = rows.map(_.getAs[Double]("__x"))
        val sal = self.saliency(xs)
        rows.indices.iterator.map { t =>
          val lo = math.max(0, t - z)
          var s = 0.0; var k = lo
          while (k < t) { s += sal(k); k += 1 }
          val localMean = if (t == 0) sal(0) else s / (t - lo)
          // eps-floored denominator: a sudden salient point after a
          // silent stretch IS anomalous; returning 0 there hid spikes on
          // quiet series (t == 0 still scores 0 via localMean = sal(0))
          val score = (sal(t) - localMean) / math.max(localMean, 1e-8)
          val orig = rows(t)
          Row.fromSeq(orig.toSeq.slice(1, 1 + nOrig) ++
            Seq(sal(t), score, score > tau))
        }
      }
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("saliency", DoubleType, nullable = false),
      StructField("sr_score", DoubleType, nullable = false),
      StructField("is_anomaly", BooleanType, nullable = false)))
  override def copy(extra: ParamMap): SRAnomalyDetector = defaultCopy(extra)
}
object SRAnomalyDetector extends graft.core.GraftReadable[SRAnomalyDetector]

