package graft.explain

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Weighted lasso via cyclic coordinate descent on standardized data
  * (ref: explainers/LassoRegression.scala:1-87 — same role: the tiny
  * per-row local model LIME/SHAP fit; dimensions are ≤ a few dozen so this
  * runs in microseconds inside `mapGroups`).
  */
object WeightedLinearSolver {

  /** Solve argmin_β Σ w_i (y_i − β₀ − xᵢβ)² + λ‖β‖₁.
    * Returns (intercept, coefficients). λ = 0 solves the normal equations
    * exactly (Gaussian elimination with partial pivoting) — coordinate
    * descent stalls on the near-collinear designs kernel SHAP's pinned
    * coalitions create; λ > 0 runs cyclic coordinate descent.
    */
  def fit(x: Array[Array[Double]], y: Array[Double], w: Array[Double],
          lambda: Double, maxIter: Int = 100, tol: Double = 1e-7): (Double, Array[Double]) = {
    val n = x.length
    if (n == 0) return (0.0, Array.empty)
    val d = x(0).length
    if (lambda == 0.0) return fitExact(x, y, w, d)
    val wSum = w.sum
    if (wSum <= 0) return (0.0, new Array[Double](d))
    // weighted means for centering
    val xMean = new Array[Double](d)
    var yMean = 0.0
    var i = 0
    while (i < n) {
      var j = 0
      while (j < d) { xMean(j) += w(i) * x(i)(j); j += 1 }
      yMean += w(i) * y(i)
      i += 1
    }
    var j = 0
    while (j < d) { xMean(j) /= wSum; j += 1 }
    yMean /= wSum
    // precompute weighted column norms
    val colNorm = new Array[Double](d)
    i = 0
    while (i < n) {
      var k = 0
      while (k < d) {
        val c = x(i)(k) - xMean(k); colNorm(k) += w(i) * c * c; k += 1
      }
      i += 1
    }
    val beta = new Array[Double](d)
    val resid = new Array[Double](n) // y - yMean - (x-xMean)·beta
    i = 0
    while (i < n) { resid(i) = y(i) - yMean; i += 1 }
    var it = 0
    var maxDelta = Double.MaxValue
    while (it < maxIter && maxDelta > tol) {
      maxDelta = 0.0
      var k = 0
      while (k < d) {
        if (colNorm(k) > 1e-12) {
          // partial residual correlation for coordinate k
          var rho = 0.0
          i = 0
          while (i < n) {
            val c = x(i)(k) - xMean(k)
            rho += w(i) * c * (resid(i) + c * beta(k))
            i += 1
          }
          // soft threshold
          val bNew =
            if (rho > lambda) (rho - lambda) / colNorm(k)
            else if (rho < -lambda) (rho + lambda) / colNorm(k)
            else 0.0
          val delta = bNew - beta(k)
          if (delta != 0.0) {
            i = 0
            while (i < n) { resid(i) -= (x(i)(k) - xMean(k)) * delta; i += 1 }
            beta(k) = bNew
            if (math.abs(delta) > maxDelta) maxDelta = math.abs(delta)
          }
        }
        k += 1
      }
      it += 1
    }
    var b0 = yMean
    j = 0
    while (j < d) { b0 -= beta(j) * xMean(j); j += 1 }
    (b0, beta)
  }

  /** Exact weighted least squares with intercept: solve
    * (AᵀWA + εI)β = AᵀWy with A = [1 | X], tiny ridge ε for rank
    * deficiency. d ≤ a few dozen here, so O(d³) is trivial. */
  private def fitExact(x: Array[Array[Double]], y: Array[Double],
                       w: Array[Double], d: Int): (Double, Array[Double]) = {
    val m = d + 1
    val ata = Array.ofDim[Double](m, m)
    val aty = new Array[Double](m)
    var i = 0
    while (i < x.length) {
      val wi = w(i)
      val row = x(i)
      // augmented feature 0 = intercept
      var a = 0
      while (a < m) {
        val va = if (a == 0) 1.0 else row(a - 1)
        var b = 0
        while (b < m) {
          val vb = if (b == 0) 1.0 else row(b - 1)
          ata(a)(b) += wi * va * vb
          b += 1
        }
        aty(a) += wi * va * y(i)
        a += 1
      }
      i += 1
    }
    // minimal ridge: with the pinned-coalition designs cond(AᵀWA) is ~1e4,
    // so 1e-12-relative keeps the perturbation far below round-off display
    var j = 0
    while (j < m) { ata(j)(j) += 1e-12 * (1.0 + ata(j)(j)); j += 1 }
    // gaussian elimination with partial pivoting
    j = 0
    while (j < m) {
      var p = j
      var k = j + 1
      while (k < m) { if (math.abs(ata(k)(j)) > math.abs(ata(p)(j))) p = k; k += 1 }
      if (p != j) {
        val t = ata(p); ata(p) = ata(j); ata(j) = t
        val ty = aty(p); aty(p) = aty(j); aty(j) = ty
      }
      val piv = ata(j)(j)
      if (math.abs(piv) > 1e-300) {
        k = j + 1
        while (k < m) {
          val f = ata(k)(j) / piv
          if (f != 0.0) {
            var c = j
            while (c < m) { ata(k)(c) -= f * ata(j)(c); c += 1 }
            aty(k) -= f * aty(j)
          }
          k += 1
        }
      }
      j += 1
    }
    val sol = new Array[Double](m)
    j = m - 1
    while (j >= 0) {
      var s = aty(j)
      var c = j + 1
      while (c < m) { s -= ata(j)(c) * sol(c); c += 1 }
      sol(j) = if (math.abs(ata(j)(j)) > 1e-300) s / ata(j)(j) else 0.0
      j -= 1
    }
    (sol(0), java.util.Arrays.copyOfRange(sol, 1, m))
  }
}

/** Shared plumbing for per-row model-agnostic explainers (ref:
  * explainers/LIMEBase.scala:67-115 — the reference's exact plan):
  * explode deterministic per-row samples → ONE distributed
  * `model.transform` over the whole sample frame → `groupByKey(id)` +
  * in-group weighted lasso. The black-box model is invoked once, on a
  * DataFrame of n·numSamples rows — never per row.
  */
abstract class LocalExplainerBase(override val uid: String) extends Transformer {
  final val idCol = new Param[String](this, "idCol", "unique row id column")
  setDefault(idCol -> "id")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val inputCols = new StringArrayParam(this, "inputCols",
    "numeric feature columns to explain")
  def setInputCols(v: Seq[String]): this.type = set(inputCols, v.toArray)
  final val scoreCol = new Param[String](this, "scoreCol",
    "model output column to explain")
  setDefault(scoreCol -> "prediction")
  def setScoreCol(v: String): this.type = set(scoreCol, v)
  final val numSamples = new IntParam(this, "numSamples",
    "perturbed samples per row", ParamValidators.gt(1))
  setDefault(numSamples -> 256)
  def setNumSamples(v: Int): this.type = set(numSamples, v)
  final val seed = new LongParam(this, "seed", "sampling seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)
  final val regularization = new DoubleParam(this, "regularization",
    "L1 penalty of the local surrogate", ParamValidators.gtEq(0))
  setDefault(regularization -> 0.0)
  def setRegularization(v: Double): this.type = set(regularization, v)

  /** The black-box scoring function: DataFrame with feature cols →
    * DataFrame that adds `scoreCol`. A fitted model's `transform`. */
  final val scoringFn = new Param[DataFrame => DataFrame](this, "scoringFn",
    "black-box scoring function (persisted via Java serialization)")
  protected def scorer: DataFrame => DataFrame = get(scoringFn).orNull
  def setModel(t: Transformer): this.type =
    set(scoringFn, (df: DataFrame) => t.transform(df))
  def setScoringFn(f: DataFrame => DataFrame): this.type = set(scoringFn, f)

  protected def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField($(idCol), LongType),
      StructField("intercept", DoubleType),
      StructField("coefficients", ArrayType(DoubleType, containsNull = false))))
}

/** Tabular LIME: perturb each numeric feature with gaussian noise scaled by
  * the column's stddev, weight samples by RBF proximity in standardized
  * space, fit a weighted lasso per row; coefficients are the explanation
  * (ref: explainers/TabularLIME.scala + Sampler.scala:1-235).
  */
class TabularLIME(override val uid: String) extends LocalExplainerBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TabularLIME"))

  final val kernelWidth = new DoubleParam(this, "kernelWidth",
    "RBF kernel width in standardized units", ParamValidators.gt(0))
  setDefault(kernelWidth -> 0.75)
  def setKernelWidth(v: Double): this.type = set(kernelWidth, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val feats = $(inputCols).toSeq
    val id = $(idCol)
    val nS = $(numSamples)
    val kw = $(kernelWidth)
    val sd = $(seed)
    val spark = df.sparkSession

    // per-feature stddev: one tiny agg (driver scalars, broadcast free)
    val statsRow = df.agg(
      stddev(col(feats.head)).as("s0"),
      feats.tail.zipWithIndex.map { case (f, i) =>
        stddev(col(f)).as(s"s${i + 1}") }: _*).head()
    val sigmas = feats.indices.map { i =>
      val s = statsRow.getDouble(i); if (s.isNaN || s == 0.0) 1.0 else s
    }.toArray

    // explode: (id, sampleIdx, perturbed features..., weight)
    val sampleSchema = StructType(
      StructField("__id", LongType) +:
      StructField("__w", DoubleType) +:
      feats.map(f => StructField(f, DoubleType)))
    val base = df.select((col(id).cast("long").as("__id") +:
      feats.map(f => col(f).cast("double"))): _*)
    val exploded = base.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(0)
        val xs = Array.tabulate(feats.length)(j => r.getDouble(j + 1))
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          val xp = new Array[Double](feats.length)
          var dist2 = 0.0
          var j = 0
          while (j < feats.length) {
            // first sample = the instance itself (anchors the surrogate)
            val delta = if (si == 0) 0.0 else rng.nextGaussian() * sigmas(j)
            xp(j) = xs(j) + delta
            val z = delta / sigmas(j)
            dist2 += z * z
            j += 1
          }
          val w = math.exp(-dist2 / (kw * kw))
          Row.fromSeq(rid +: w +: xp.toSeq)
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded)
      .select(col("__id"), col("__w"), col($(scoreCol)).cast("double").as("__y"),
        struct(feats.map(col): _*).as("__x"))

    val lam = $(regularization)
    val nF = feats.length
    val outSchema = transformSchema(df.schema)
    val grouped = scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(r => Array.tabulate(nF)(j =>
          r.getStruct(3).getDouble(j)))
        val y = buf.map(_.getDouble(2))
        val w = buf.map(_.getDouble(1))
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lam)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
    grouped.toDF($(idCol), "intercept", "coefficients")
  }
  override def copy(extra: ParamMap): TabularLIME = {
    val c = new TabularLIME(uid); copyValues(c, extra)
  }
}
object TabularLIME extends graft.core.GraftReadable[TabularLIME]


/** Kernel SHAP over tabular numeric features: coalition sampling with the
  * Shapley kernel, masked features replaced by background means, weighted
  * least squares whose coefficients are the per-feature SHAP values
  * (ref: explainers/KernelSHAPBase.scala:1-138, KernelSHAPSampler.scala).
  * Includes the empty and full coalitions with pinning weights so
  * `intercept ≈ E[f]` and `intercept + Σφ ≈ f(x)`.
  */
class TabularSHAP(override val uid: String) extends LocalExplainerBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TabularSHAP"))

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val feats = $(inputCols).toSeq
    val id = $(idCol)
    val nS = math.max($(numSamples), 4)
    val sd = $(seed)

    // background = per-feature mean: one tiny agg (decimal-exact so the
    // explanation is bit-reproducible across partitionings and engines)
    val bgRow = df.agg(
      graft.core.Determinism.deterministicMean(col(feats.head)).as("m0"),
      feats.tail.zipWithIndex.map { case (f, i) =>
        graft.core.Determinism.deterministicMean(col(f)).as(s"m${i + 1}") }: _*)
      .head()
    val bg = feats.indices.map(bgRow.getDouble).toArray
    val nF = feats.length

    def shapKernel(s: Int): Double =
      if (s == 0 || s == nF) 1e4 // pinning weights for the constraints
      // (when the black box is exactly additive the fit is exact and the
      // weight magnitude is irrelevant; smaller keeps the system
      // well-conditioned for the exact solver)
      else {
        // (M-1) / (C(M,s) * s * (M-s))
        var c = 1.0
        var i = 0
        while (i < s) { c = c * (nF - i) / (i + 1); i += 1 }
        (nF - 1).toDouble / (c * s * (nF - s))
      }

    val sampleSchema = StructType(
      StructField("__id", LongType) +:
      StructField("__w", DoubleType) +:
      StructField("__mask", ArrayType(DoubleType, containsNull = false)) +:
      feats.map(f => StructField(f, DoubleType)))
    val base = df.select((col(id).cast("long").as("__id") +:
      feats.map(f => col(f).cast("double"))): _*)
    val exploded = base.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(0)
        val xs = Array.tabulate(nF)(j => r.getDouble(j + 1))
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          // sample 0 = empty coalition, 1 = full; rest random non-trivial
          val mask = new Array[Double](nF)
          if (si == 1) java.util.Arrays.fill(mask, 1.0)
          else if (si > 1) {
            var nnz = 0
            var j = 0
            while (j < nF) {
              if (rng.nextBoolean()) { mask(j) = 1.0; nnz += 1 }
              j += 1
            }
            if (nnz == 0) mask(rng.nextInt(nF)) = 1.0
            else if (nnz == nF) mask(rng.nextInt(nF)) = 0.0
          }
          val s = mask.count(_ == 1.0)
          val xp = Array.tabulate(nF)(j => if (mask(j) == 1.0) xs(j) else bg(j))
          Row.fromSeq(rid +: shapKernel(s) +: mask.toSeq +: xp.toSeq)
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded)
      .select(col("__id"), col("__w"), col("__mask"),
        col($(scoreCol)).cast("double").as("__y"))

    val lam = $(regularization)
    val outSchema = transformSchema(df.schema)
    val grouped = scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(_.getSeq[Double](2).toArray)
        val w = buf.map(_.getDouble(1))
        val y = buf.map(_.getDouble(3))
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lam)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
    grouped.toDF($(idCol), "intercept", "coefficients")
  }
  override def copy(extra: ParamMap): TabularSHAP = {
    val c = new TabularSHAP(uid); copyValues(c, extra)
  }
}
object TabularSHAP extends graft.core.GraftReadable[TabularSHAP]


/** Shared plumbing for explainers over a single vector/array feature
  * column (ref: explainers/VectorLIME.scala:1-60, VectorSHAP.scala:1-55 —
  * same surface: one `inputCol` holding the assembled features, per-
  * dimension attributions out). Reuses the tabular machinery's plan —
  * deterministic per-row sample explosion, ONE distributed scorer pass,
  * per-row weighted solve in `mapGroups` — with samples built per vector
  * dimension. Accepts `VectorUDT` or `array<numeric>` and hands the
  * scorer perturbed features in the SAME type it was trained on.
  */
abstract class VectorExplainerBase(uid: String) extends LocalExplainerBase(uid) {
  final val inputCol = new Param[String](this, "inputCol",
    "vector/array feature column to explain")
  def setInputCol(v: String): this.type = set(inputCol, v)

  protected def isVectorType(dt: DataType): Boolean =
    dt == org.apache.spark.ml.linalg.SQLDataTypes.VectorType

  /** (id, features-as-double-array) projection + a function restoring the
    * scorer's expected feature type from the perturbed double array. */
  protected def baseAndRestore(df: DataFrame):
      (DataFrame, org.apache.spark.sql.Column => org.apache.spark.sql.Column) = {
    val dt = df.schema($(inputCol)).dataType
    val asArr =
      if (isVectorType(dt))
        org.apache.spark.ml.functions.vector_to_array(col($(inputCol)))
      else col($(inputCol)).cast(ArrayType(DoubleType))
    val base = df.select(col($(idCol)).cast("long").as("__id"),
      asArr.as("__x"))
    val restore: org.apache.spark.sql.Column => org.apache.spark.sql.Column =
      if (isVectorType(dt)) org.apache.spark.ml.functions.array_to_vector
      else (c: org.apache.spark.sql.Column) => c.cast(dt)
    (base, restore)
  }
}

/** LIME over a vector feature column: gaussian perturbation per dimension
  * scaled by the corpus' per-dimension stddev (one Summarizer pass, no
  * shuffle), RBF proximity weights in standardized space, per-row weighted
  * lasso — the vector twin of [[TabularLIME]] (ref:
  * explainers/VectorLIME.scala + LIMEVectorSampler).
  */
class VectorLIME(override val uid: String) extends VectorExplainerBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("VectorLIME"))

  final val kernelWidth = new DoubleParam(this, "kernelWidth",
    "RBF kernel width in sqrt(d)-scaled standardized units",
    ParamValidators.gt(0))
  setDefault(kernelWidth -> 0.75)
  def setKernelWidth(v: Double): this.type = set(kernelWidth, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val (base, restore) = baseAndRestore(df)
    val nS = $(numSamples)
    val kw = $(kernelWidth)
    val sd = $(seed)

    // per-dimension stddev in ONE pass (Summarizer aggregates vectors
    // map-side; nothing wider than d doubles crosses the wire)
    val stdVec = df
      .select(org.apache.spark.ml.stat.Summarizer.std(
        if (isVectorType(df.schema($(inputCol)).dataType)) col($(inputCol))
        else org.apache.spark.ml.functions.array_to_vector(
          col($(inputCol)).cast(ArrayType(DoubleType)))).as("s"))
      .head().getAs[org.apache.spark.ml.linalg.Vector](0)
    val sigmas = stdVec.toArray.map(s => if (s.isNaN || s == 0.0) 1.0 else s)
    val nF = sigmas.length
    // standardized distances concentrate at sqrt(d): an unscaled RBF
    // underflows to 0 for EVERY perturbed sample once d is a few dozen,
    // leaving the surrogate fit to a single anchor point. The public LIME
    // default (lime_tabular.py) is kernel_width = 0.75 * sqrt(d) for the
    // same reason.
    val kw2 = kw * kw * nF

    val sampleSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__w", DoubleType),
      StructField("__x", ArrayType(DoubleType, containsNull = false))))
    val exploded = base.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(0)
        val xs = r.getSeq[Double](1).toArray
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          val xp = new Array[Double](xs.length)
          var dist2 = 0.0
          var j = 0
          while (j < xs.length) {
            // first sample = the instance itself (anchors the surrogate)
            val delta = if (si == 0) 0.0 else rng.nextGaussian() * sigmas(j)
            xp(j) = xs(j) + delta
            val z = delta / sigmas(j)
            dist2 += z * z
            j += 1
          }
          Row(rid, math.exp(-dist2 / kw2), xp.toSeq)
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded.withColumn($(inputCol), restore(col("__x"))))
      .select(col("__id"), col("__w"), col("__x"),
        col($(scoreCol)).cast("double").as("__y"))

    val lam = $(regularization)
    val outSchema = transformSchema(df.schema)
    scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(_.getSeq[Double](2).toArray)
        val w = buf.map(_.getDouble(1))
        val y = buf.map(_.getDouble(3))
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lam)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
      .toDF($(idCol), "intercept", "coefficients")
  }
  override def copy(extra: ParamMap): VectorLIME = {
    val c = new VectorLIME(uid); copyValues(c, extra)
  }
}
object VectorLIME extends graft.core.GraftReadable[VectorLIME]


/** Kernel SHAP over a vector feature column: coalition masks per
  * dimension, masked dimensions replaced by decimal-exact per-dimension
  * background means (bit-reproducible, so a linear black box is
  * oracle-checkable), Shapley-kernel weighted least squares — the vector
  * twin of [[TabularSHAP]] (ref: explainers/VectorSHAP.scala +
  * KernelSHAPSampler).
  */
class VectorSHAP(override val uid: String) extends VectorExplainerBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("VectorSHAP"))

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val (base, restore) = baseAndRestore(df)
    val nS = math.max($(numSamples), 4)
    val sd = $(seed)

    // per-dimension background mean, decimal-exact: unnest to (dim, v) —
    // map-side-combining keyed agg over n·d skinny rows, collected as d
    // driver doubles. Deterministic regardless of partitioning.
    val meansRows = base
      .select(posexplode(col("__x")).as(Seq("__dim", "__v")))
      .groupBy("__dim")
      .agg(graft.core.Determinism.deterministicMean(col("__v")).as("__m"))
      .collect()
    val nF = meansRows.length
    val bg = new Array[Double](nF)
    meansRows.foreach(r => bg(r.getInt(0)) = r.getDouble(1))

    // Coalition SIZES are importance-sampled from the normalized Shapley
    // kernel over sizes, pi(s) ∝ (M-1)/(s(M-s)) (the C(M,s) term cancels
    // against drawing a uniform subset of that size), and sampled rows get
    // UNIFORM solver weight — the public KernelSHAP construction. Keeping
    // uniform masks and putting the kernel in the solver weights instead
    // (the low-d tabular shortcut) collapses at vector widths: a mid-size
    // coalition's kernel weight is ~1/C(64,32) ≈ 1e-19, 23 orders below
    // the constraint pins, so every sampled row sinks beneath the solver's
    // ridge and the fit degenerates to the two pinned points.
    val sizeCdf = new Array[Double](math.max(nF - 1, 1))
    if (nF > 1) {
      var acc = 0.0
      var s = 1
      while (s < nF) {
        acc += (nF - 1).toDouble / (s.toDouble * (nF - s))
        sizeCdf(s - 1) = acc
        s += 1
      }
      s = 1
      while (s < nF) { sizeCdf(s - 1) /= acc; s += 1 }
    } else sizeCdf(0) = 1.0

    val sampleSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__w", DoubleType),
      StructField("__mask", ArrayType(DoubleType, containsNull = false)),
      StructField("__x", ArrayType(DoubleType, containsNull = false))))
    val exploded = base.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(0)
        val xs = r.getSeq[Double](1).toArray
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          // sample 0 = empty coalition, 1 = full (pinned constraints);
          // the rest: kernel-distributed size, uniform subset of that size
          val mask = new Array[Double](nF)
          var weight = 1e4
          if (si == 1) java.util.Arrays.fill(mask, 1.0)
          else if (si > 1) {
            weight = 1.0
            val u = rng.nextDouble()
            var s = 1
            while (s < nF - 1 && sizeCdf(s - 1) < u) s += 1
            // partial Fisher-Yates: first s entries of a shuffled index
            // array are the coalition
            val idx = Array.range(0, nF)
            var j = 0
            while (j < s) {
              val k = j + rng.nextInt(nF - j)
              val t = idx(j); idx(j) = idx(k); idx(k) = t
              mask(idx(j)) = 1.0
              j += 1
            }
          }
          val xp = Array.tabulate(nF)(j => if (mask(j) == 1.0) xs(j) else bg(j))
          Row(rid, weight, mask.toSeq, xp.toSeq)
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded.withColumn($(inputCol), restore(col("__x"))))
      .select(col("__id"), col("__w"), col("__mask"),
        col($(scoreCol)).cast("double").as("__y"))

    val lam = $(regularization)
    val outSchema = transformSchema(df.schema)
    scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(_.getSeq[Double](2).toArray)
        val w = buf.map(_.getDouble(1))
        val y = buf.map(_.getDouble(3))
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lam)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
      .toDF($(idCol), "intercept", "coefficients")
  }
  override def copy(extra: ParamMap): VectorSHAP = {
    val c = new VectorSHAP(uid); copyValues(c, extra)
  }
}
object VectorSHAP extends graft.core.GraftReadable[VectorSHAP]


/** Kernel SHAP coalition sampling shared by the segment/token/dimension
  * explainers: sizes drawn from the normalized Shapley kernel over sizes
  * pi(s) ∝ (M-1)/(s(M-s)) — uniform subset within a size — with the empty
  * and full coalitions pinned at large weight so `intercept ≈ f(empty)`
  * and `intercept + Σφ ≈ f(x)` (the public KernelSHAP construction).
  */
private[explain] object ShapSampling {
  /** Cumulative size distribution for a k-feature coalition space. */
  def sizeCdf(k: Int): Array[Double] = {
    val n = math.max(k - 1, 1)
    val cdf = new Array[Double](n)
    if (k > 1) {
      var acc = 0.0
      var s = 1
      while (s < k) {
        acc += (k - 1).toDouble / (s.toDouble * (k - s))
        cdf(s - 1) = acc
        s += 1
      }
      s = 1
      while (s < k) { cdf(s - 1) /= acc; s += 1 }
    } else cdf(0) = 1.0
    cdf
  }

  /** Coalition mask + solver weight for sample `si`: 0 = empty, 1 = full
    * (both pinned at 1e4), else kernel-size-sampled uniform subset at
    * weight 1. */
  def coalition(rng: java.util.Random, k: Int, si: Int,
      cdf: Array[Double]): (Array[Boolean], Double) = {
    val mask = new Array[Boolean](k)
    if (si == 0) (mask, 1e4)
    else if (si == 1 || k == 1) {
      if (si == 1) java.util.Arrays.fill(mask, true)
      else mask(0) = rng.nextBoolean() // k=1: only empty/full exist
      (mask, if (si == 1) 1e4 else 1.0)
    } else {
      val u = rng.nextDouble()
      var s = 1
      while (s < k - 1 && cdf(s - 1) < u) s += 1
      val idx = Array.range(0, k)
      var j = 0
      while (j < s) {
        val p = j + rng.nextInt(k - j)
        val t = idx(j); idx(j) = idx(p); idx(p) = t
        mask(idx(j)) = true
        j += 1
      }
      (mask, 1.0)
    }
  }
}
