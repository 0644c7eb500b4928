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
  * Scale design: per iteration, ONE map-side-combinable aggregation
  * computes (n, exact decimal sums of x and x^2), a broadcast join prices
  * every row's deviation, and a second map-side-combinable `max(struct)`
  * picks the per-series argmax — no window sort, no per-series collect.
  * The removed-point sets stay tiny (k rows per series) and anti-join back
  * as broadcasts. Input is persisted once across the k passes.
  *
  * Determinism: sums are exact decimals (order-independent); all scalar
  * arithmetic is fixed-order IEEE, so verdicts are reproducible and
  * oracle-checkable when inputs are fixed-decimal.
  */
class ESDAnomalyDetector(override val uid: String) extends Transformer
    with HasInputCol {
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

  /** Rosner critical value for removal i (1-based) of an n-point series. */
  def esdLambda(n: Long, i: Int, a: Double): Double = {
    val df = n - i - 1
    if (df <= 0) Double.PositiveInfinity
    else {
      val p = 1.0 - a / (2.0 * (n - i + 1))
      val t = StudentT.quantile(p, df.toDouble)
      (n - i) * t / math.sqrt((df + t * t) * (n - i + 1.0))
    }
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    val groups = $(groupCols).toSeq
    val id = col($(idCol))
    val k = $(maxAnomalies)
    val x = col(getInputCol).cast("double")

    // series key as one string column (driver-side maps key on it); the
    //  separator avoids cross-column collisions
    val keyCol =
      if (groups.isEmpty) lit("")
      else concat_ws("",
        groups.map(c => coalesce(col(c).cast("string"), lit(""))): _*)
    val base = df.select(keyCol.as("__k"), id.cast("long").as("__id"),
        x.as("__x"))
      .filter(col("__x").isNotNull) // null points are not part of any series
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-series (n, Σx, Σx²) — collected ONCE; all later iterations
    // update these driver-side by subtracting the removed point (exact:
    // the sums are fixed-decimal). Size bound = number of series, the
    // same bound the per-iteration broadcasts already impose.
    case class SeriesStats(n: Long, s: BigDecimal, q: BigDecimal)
    var stats: Map[String, SeriesStats] = base.groupBy(col("__k")).agg(
        count(lit(1)).as("__n"),
        sum(col("__x").cast(DecimalType(30, 8))).as("__s"),
        sum((col("__x") * col("__x")).cast(DecimalType(30, 8))).as("__q"))
      .collect()
      .map(r => r.getString(0) -> SeriesStats(r.getLong(1),
        BigDecimal(r.getDecimal(2)), BigDecimal(r.getDecimal(3)))).toMap
    val n0 = stats.map { case (key, st) => key -> st.n }

    // iteration trace rows collected per pass: (key, id, x, iter, r)
    case class Removal(key: String, id: Long, x: Double, iter: Int, r: Double)
    val removals = scala.collection.mutable.ArrayBuffer.empty[Removal]
    var remaining = base
    val statsSchema = StructType(Seq(StructField("__k", StringType),
      StructField("__n", LongType), StructField("__s", DoubleType),
      StructField("__q", DoubleType)))
    for (i <- 1 to k) {
      val statsRows = stats.toSeq.map { case (key, st) =>
        Row(key, st.n, st.s.toDouble, st.q.toDouble)
      }
      val statsDf = spark.createDataFrame(
        new java.util.ArrayList[Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(statsRows).asJava),
        statsSchema)
      val dev = abs(col("__n").cast("double") * col("__x") - col("__s"))
      // ONE pass: argmax via map-side-combinable max(struct)
      val top = remaining.join(broadcast(statsDf), "__k")
        .withColumn("__dev", dev)
        .groupBy(col("__k"))
        .agg(max(struct(col("__dev"), (-col("__id")).as("__nid"),
          col("__id"), col("__x"), col("__n"), col("__s"), col("__q"))).as("__m"))
        .select(col("__k"), col("__m.__id"), col("__m.__x"),
          (col("__m.__dev") / (col("__m.__n").cast("double") *
            sqrt((col("__m.__n").cast("double") * col("__m.__q") -
              col("__m.__s") * col("__m.__s")) /
              (col("__m.__n").cast("double") * (col("__m.__n").cast("double") - 1.0)))))
            .as("__r"))
        .collect()
      top.foreach { r =>
        removals += Removal(r.getString(0), r.getLong(1), r.getDouble(2), i,
          r.getDouble(3))
      }
      stats = top.map { r =>
        val key = r.getString(0); val st = stats(key); val xv = r.getDouble(2)
        // exact decimal updates mirror what a re-aggregation would return
        key -> SeriesStats(st.n - 1,
          st.s - BigDecimal(xv).setScale(8, BigDecimal.RoundingMode.HALF_UP),
          st.q - BigDecimal(xv * xv).setScale(8, BigDecimal.RoundingMode.HALF_UP))
      }.toMap ++ (stats -- top.map(_.getString(0))) // series too short to continue
      if (i < k) {
        val removedDf = spark.createDataFrame(
          new java.util.ArrayList[Row](scala.jdk.CollectionConverters
            .SeqHasAsJava(top.toSeq.map(r => Row(r.getString(0), r.getLong(1)))).asJava),
          StructType(Seq(StructField("__k", StringType),
            StructField("__id", LongType))))
        remaining = remaining.join(broadcast(removedDf), Seq("__k", "__id"),
          "left_anti")
      }
    }
    base.unpersist(blocking = false)

    // verdicts computed driver-side from the trace (k rows per series)
    val alphaV = $(alpha)
    val cvs = if (isSet(criticalValues)) {
      val v = $(criticalValues)
      require(v.length >= k, s"need $k critical values, got ${v.length}")
      Some(v)
    } else None
    val lastPass: Map[String, Int] = removals.groupBy(_.key).map {
      case (key, rs) =>
        val li = rs.filter(t => t.r >
            cvs.map(_(t.iter - 1)).getOrElse(esdLambda(n0(key), t.iter, alphaV)))
          .map(_.iter)
        key -> (if (li.isEmpty) 0 else li.max)
    }
    val verdictRows = removals
      .filter(t => t.iter <= lastPass.getOrElse(t.key, 0))
      .map(t => Row(t.key, t.id, t.iter))
    val verdicts = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(verdictRows.toSeq).asJava),
      StructType(Seq(StructField("__k", StringType),
        StructField("__id", LongType), StructField("__anom_iter", IntegerType))))
    df.withColumn("__k", keyCol).withColumn("__id", id.cast("long"))
      .join(broadcast(verdicts), Seq("__k", "__id"), "left")
      .withColumn("iter", col("__anom_iter"))
      .withColumn("is_anomaly", col("__anom_iter").isNotNull)
      .drop("__k", "__id", "__anom_iter")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(StructField("iter", IntegerType),
      StructField("is_anomaly", BooleanType, nullable = false)))
  override def copy(extra: ParamMap): ESDAnomalyDetector = defaultCopy(extra)
}
