package graft.anomaly

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Student's t distribution, driver-side numerics for ESD critical values.
  * CDF via the regularized incomplete beta continued fraction (Lentz);
  * quantile via bisection — deterministic to ~1e-12, no native libs.
  */
object StudentT {

  /** Regularized incomplete beta I_x(a, b), modified Lentz continued
    * fraction (Numerical Recipes 6.4 construction, public domain math). */
  def incompleteBeta(a: Double, b: Double, x: Double): Double = {
    require(x >= 0 && x <= 1, s"x=$x")
    if (x == 0.0 || x == 1.0) x
    else {
      val front = math.exp(
        a * math.log(x) + b * math.log1p(-x) - logBeta(a, b)) / a
      // continued fraction for I_x(a,b); use symmetry for convergence
      if (x > (a + 1) / (a + b + 2)) 1.0 - incompleteBeta(b, a, 1.0 - x)
      else {
        var f = 1.0; var c = 1.0; var d = 0.0
        var i = 0
        while (i <= 300) {
          val m = i / 2
          val numerator =
            if (i == 0) 1.0
            else if (i % 2 == 0) m * (b - m) * x / ((a + 2 * m - 1) * (a + 2 * m))
            else -(a + m) * (a + b + m) * x / ((a + 2 * m) * (a + 2 * m + 1))
          d = 1.0 + numerator * d
          if (math.abs(d) < 1e-30) d = 1e-30
          d = 1.0 / d
          c = 1.0 + numerator / c
          if (math.abs(c) < 1e-30) c = 1e-30
          val cd = c * d
          f *= cd
          if (math.abs(1.0 - cd) < 1e-15) return front * (f - 1.0)
          i += 1
        }
        front * (f - 1.0)
      }
    }
  }

  private def logBeta(a: Double, b: Double): Double =
    logGamma(a) + logGamma(b) - logGamma(a + b)

  /** Lanczos log-gamma (g=7, n=9 coefficients — standard public values). */
  def logGamma(xIn: Double): Double = {
    val g = Array(
      0.99999999999980993, 676.5203681218851, -1259.1392167224028,
      771.32342877765313, -176.61502916214059, 12.507343278686905,
      -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7)
    if (xIn < 0.5)
      math.log(math.Pi / math.sin(math.Pi * xIn)) - logGamma(1.0 - xIn)
    else {
      val x = xIn - 1.0
      var a = g(0)
      val t = x + 7.5
      var i = 1
      while (i < 9) { a += g(i) / (x + i); i += 1 }
      0.5 * math.log(2 * math.Pi) + (x + 0.5) * math.log(t) - t + math.log(a)
    }
  }

  /** P(T <= t) for T ~ t(df). */
  def cdf(t: Double, df: Double): Double = {
    val x = df / (df + t * t)
    val p = 0.5 * incompleteBeta(df / 2.0, 0.5, x)
    if (t > 0) 1.0 - p else p
  }

  /** Inverse CDF by bisection (monotone, ~50 iterations to 1e-12). */
  def quantile(p: Double, df: Double): Double = {
    require(p > 0 && p < 1, s"p=$p")
    var lo = -1000.0; var hi = 1000.0
    var i = 0
    while (i < 200 && hi - lo > 1e-12 * math.max(1.0, math.abs(lo))) {
      val mid = (lo + hi) / 2
      if (cdf(mid, df) < p) lo = mid else hi = mid
      i += 1
    }
    (lo + hi) / 2
  }
}

/** Generalized ESD outlier test (Rosner 1983), distributed per-series —
  * the native stand-in for the reference's REST DetectAnomalies family
  * (ref: cognitive/.../AnomalyDetection.scala:24-249, which ships each
  * series to the Azure anomaly service; here the same per-series verdicts
  * are computed in-cluster, so 100 TB of series never leave the executors).
  *
  * Algorithm: k = `maxAnomalies` iterations; each removes the point with
  * the largest |x - mean| of its series (tie → smallest id) and records
  * the test statistic R_i = max|x - mean| / sd. The series' anomaly count
  * is the largest i with R_i > lambda_i; rows removed at iterations <= that
  * i are flagged. lambda_i defaults to Rosner's t-based critical values
  * (alpha), or `criticalValues` overrides them explicitly.
  *
  * Scale design: ONE shuffle groups each series onto an executor
  * (`groupByKey` on the series key) and the entire k-iteration Rosner
  * loop runs inside `flatMapGroups` over that series' points — a series
  * is bounded (one time series per key), so the group fits in executor
  * memory, and the driver holds NO per-series state: no driver map over
  * series, no per-iteration collect, no locally-built broadcast frames.
  * Millions of series scale horizontally with executors. The verdict
  * table (≤ k rows per series) joins back by (key, id); AQE picks
  * broadcast when it is small.
  *
  * Determinism: sums are exact decimals (order-independent); all scalar
  * arithmetic is fixed-order IEEE identical to a per-iteration
  * re-aggregation, so verdicts are reproducible and oracle-checkable when
  * inputs are fixed-decimal.
  */
class ESDAnomalyDetector(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ESDAnomalyDetector"))

  final val idCol = new Param[String](this, "idCol", "unique point id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val groupCols = new StringArrayParam(this, "groupCols",
    "series key columns (empty = one global series)")
  setDefault(groupCols -> Array.empty[String])
  def setGroupCols(v: Array[String]): this.type = set(groupCols, v)
  final val maxAnomalies = new IntParam(this, "maxAnomalies",
    "ESD iteration count k", ParamValidators.gt(0))
  setDefault(maxAnomalies -> 3)
  def setMaxAnomalies(v: Int): this.type = set(maxAnomalies, v)
  final val alpha = new DoubleParam(this, "alpha", "significance level")
  setDefault(alpha -> 0.05)
  def setAlpha(v: Double): this.type = set(alpha, v)
  final val criticalValues = new DoubleArrayParam(this, "criticalValues",
    "explicit lambda_i per iteration (overrides alpha-based values)")
  def setCriticalValues(v: Array[Double]): this.type = set(criticalValues, v)
  /** Hard bound on points per series: the Rosner loop materializes one
    * series as an in-task array (~40 B/point), so a pathological series
    * must fail with a clear message naming this knob rather than OOM an
    * executor. 10M points ≈ 400 MB task memory — raise it only with the
    * executor heap to match, or pre-aggregate (e.g. 1-minute means) before
    * detection, which is the statistically sound move anyway at that
    * density. */
  final val maxSeriesPoints = new IntParam(this, "maxSeriesPoints",
    "max points materialized per series (guard against executor OOM)",
    ParamValidators.gt(0))
  setDefault(maxSeriesPoints -> 10000000)
  def setMaxSeriesPoints(v: Int): this.type = set(maxSeriesPoints, v)

  /** Rosner critical value for removal i (1-based) of an n-point series. */
  def esdLambda(n: Long, i: Int, a: Double): Double =
    ESDAnomalyDetector.esdLambda(n, i, a)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    import spark.implicits._
    val groups = $(groupCols).toSeq
    val id = col($(idCol))
    val k = $(maxAnomalies)
    val x = col(getInputCol).cast("double")
    val alphaV = $(alpha)
    val cvs: Option[Array[Double]] = if (isSet(criticalValues)) {
      val v = $(criticalValues)
      require(v.length >= k, s"need $k critical values, got ${v.length}")
      Some(v)
    } else None

    // series key as one string column; the separator avoids cross-column
    // collisions
    val keyCol =
      if (groups.isEmpty) lit("")
      else concat_ws("\u0001",
        groups.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val base = df.select(keyCol.as("__k"), id.cast("long").as("__id"),
        x.as("__x"))
      // null values are not part of any series; rows with a null (or
      // non-castable) id cannot be keyed to a verdict and would break the
      // primitive tuple encoding below
      .filter(col("__x").isNotNull && col("__id").isNotNull)

    // ONE shuffle: each series lands whole on an executor and the entire
    // k-iteration Rosner loop runs there — no driver-side per-series map,
    // no per-iteration collect, no locally-built broadcast frames
    val maxPts = $(maxSeriesPoints)
    val verdicts = base.as[(String, Long, Double)]
      .groupByKey(_._1)
      .flatMapGroups { (key, rows) =>
        ESDAnomalyDetector.rosnerVerdicts(rows, k, alphaV, cvs, maxPts, key)
          .map { case (pid, iter) => (key, pid, iter) }
      }
      .toDF("__k", "__id", "__anom_iter")

    df.withColumn("__k", keyCol).withColumn("__id", id.cast("long"))
      .join(verdicts, Seq("__k", "__id"), "left")
      .withColumn("iter", col("__anom_iter"))
      .withColumn("is_anomaly", col("__anom_iter").isNotNull)
      .drop("__k", "__id", "__anom_iter")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(StructField("iter", IntegerType),
      StructField("is_anomaly", BooleanType, nullable = false)))
  override def copy(extra: ParamMap): ESDAnomalyDetector = defaultCopy(extra)
}

object ESDAnomalyDetector extends graft.core.GraftReadable[ESDAnomalyDetector] {

  // per-JVM memo for the t-quantile bisection (~200 iterations of an
  // incomplete-beta continued fraction): millions of series share few
  // distinct lengths, so executor-side verdicts would otherwise redo
  // identical numerics per series. Bounded so adversarial length variety
  // cannot grow the map without limit.
  private val lambdaCache =
    new java.util.concurrent.ConcurrentHashMap[(Long, Int, Double), Double]()
  private val lambdaCacheCap = 1 << 20

  /** Rosner critical value for removal i (1-based) of an n-point series. */
  def esdLambda(n: Long, i: Int, a: Double): Double = {
    def compute: Double = {
      val df = n - i - 1
      if (df <= 0) Double.PositiveInfinity
      else {
        val p = 1.0 - a / (2.0 * (n - i + 1))
        val t = StudentT.quantile(p, df.toDouble)
        (n - i) * t / math.sqrt((df + t * t) * (n - i + 1.0))
      }
    }
    if (lambdaCache.size >= lambdaCacheCap) compute
    else lambdaCache.computeIfAbsent((n, i, a), _ => compute)
  }

  private def dec8(v: Double): BigDecimal =
    BigDecimal(v).setScale(8, BigDecimal.RoundingMode.HALF_UP)

  /** The full k-iteration Rosner loop for ONE series, run executor-side.
    * Numerics are bit-identical to a per-iteration decimal re-aggregation:
    * running sums are exact decimals at scale 8 (matching a
    * `sum(cast(x as decimal(30,8)))`), each iteration converts them to
    * IEEE doubles in the same fixed order the former plan-level
    * implementation used (dev = |n·x − Σx|, R = dev / (n·sd)), and the
    * argmax tie-break is (deviation desc, id asc) under IEEE total order.
    * Returns the flagged (id, iteration) pairs.
    */
  private[anomaly] def rosnerVerdicts(
      rows: Iterator[(String, Long, Double)], k: Int, alpha: Double,
      cvs: Option[Array[Double]], maxPts: Int = Int.MaxValue,
      key: String = ""): Iterator[(Long, Int)] = {
    // (id, x); bounded by maxSeriesPoints — fail loudly, not executor-OOM
    val buf = new scala.collection.mutable.ArrayBuffer[(Long, Double)]()
    rows.foreach { t =>
      if (buf.length >= maxPts)
        throw new IllegalStateException(
          s"series '$key' exceeds maxSeriesPoints=$maxPts points; " +
            "raise setMaxSeriesPoints (with executor heap to match) or " +
            "pre-aggregate the series before ESD detection")
      buf += ((t._2, t._3))
    }
    val pts = buf.toArray
    val n0 = pts.length.toLong
    var n = n0
    var s = BigDecimal(0); var q = BigDecimal(0)
    var j = 0
    while (j < pts.length) {
      s += dec8(pts(j)._2); q += dec8(pts(j)._2 * pts(j)._2); j += 1
    }
    val alive = Array.fill(pts.length)(true)
    var nAlive = pts.length
    // (id, iter, R) trace, at most k entries
    val removals = new scala.collection.mutable.ArrayBuffer[(Long, Int, Double)](k)
    var i = 1
    while (i <= k && nAlive > 0) {
      val sD = s.toDouble; val qD = q.toDouble; val nD = n.toDouble
      var bestIdx = -1; var bestDev = Double.NegativeInfinity
      j = 0
      while (j < pts.length) {
        if (alive(j)) {
          val devJ = math.abs(nD * pts(j)._2 - sD)
          val c = java.lang.Double.compare(devJ, bestDev) // NaN sorts greatest
          // (deviation desc, id asc, x desc): the x tie-break keeps the
          // selection deterministic even for duplicate ids, matching the
          // former max(struct(dev, -id, id, x, ...)) lexicographic order
          val better = c > 0 || (c == 0 && (bestIdx < 0 ||
            pts(j)._1 < pts(bestIdx)._1 ||
            (pts(j)._1 == pts(bestIdx)._1 &&
              java.lang.Double.compare(pts(j)._2, pts(bestIdx)._2) > 0)))
          if (better) { bestIdx = j; bestDev = devJ }
        }
        j += 1
      }
      val xv = pts(bestIdx)._2
      val r = bestDev / (nD * math.sqrt((nD * qD - sD * sD) / (nD * (nD - 1.0))))
      removals += ((pts(bestIdx)._1, i, r))
      alive(bestIdx) = false; nAlive -= 1
      n -= 1; s -= dec8(xv); q -= dec8(xv * xv)
      i += 1
    }
    // largest iteration whose R exceeds its critical value; rows removed
    // at iterations <= that bound are the anomalies
    var lastPass = 0
    removals.foreach { case (_, iter, r) =>
      val lam = cvs.map(_(iter - 1)).getOrElse(esdLambda(n0, iter, alpha))
      if (r > lam && iter > lastPass) lastPass = iter
    }
    val lp = lastPass
    removals.iterator.filter(_._2 <= lp).map { case (pid, iter, _) => (pid, iter) }
  }
}
