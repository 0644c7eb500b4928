package graft.cyber

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** CyberML operators (ref: core/src/main/python/mmlspark/cyber/ — pure
  * PySpark in the reference, re-expressed as Scala DataFrame ops per
  * SURVEY §2.4). All per-tenant statistics run as ONE groupBy + broadcast
  * join back — the tenant-stats frame is |tenants| rows, tiny by
  * construction.
  *
  * Determinism: means/variances go through DECIMAL partial sums (exact,
  * order-independent) with the final arithmetic in double — bit-identical
  * to a DuckDB oracle evaluating the same formula.
  */
trait HasTenantCol extends Params {
  final val tenantCol = new Param[String](this, "tenantCol", "tenant column")
  setDefault(tenantCol -> "tenant")
  def getTenantCol: String = $(tenantCol)
  def setTenantCol(v: String): this.type = set(tenantCol, v)
}

/** Per-tenant z-score standardization (ref: cyber/feature/scalers.py
  * StandardScalarScaler): out = (x − mean_t) / std_t, std from the
  * unbiased sample variance computed with exact decimal sums.
  */
class PerTenantStandardScaler(override val uid: String) extends Transformer
    with HasTenantCol with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PerTenantStandardScaler"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val x = col(getInputCol).cast("double")
    val stats = df.groupBy(col(getTenantCol))
      .agg(
        count(x).as("__n"),
        sum(x.cast(DecimalType(30, 8))).cast("double").as("__sum"),
        sum((x * x).cast(DecimalType(38, 8))).cast("double").as("__sumsq"))
      .select(col(getTenantCol),
        (col("__sum") / col("__n")).as("__mean"),
        // unbiased sample variance from exact sums
        when(col("__n") > 1,
          sqrt((col("__sumsq") - col("__sum") * col("__sum") / col("__n"))
            / (col("__n") - 1)))
          .otherwise(lit(null)).as("__std"))
    df.join(broadcast(stats), getTenantCol)
      .withColumn(getOutputCol,
        when(col("__std").isNull || col("__std") === 0.0, lit(0.0))
          .otherwise((x - col("__mean")) / col("__std")))
      .drop("__mean", "__std")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, DoubleType))
  override def copy(extra: ParamMap): PerTenantStandardScaler = defaultCopy(extra)
}
object PerTenantStandardScaler extends graft.core.GraftReadable[PerTenantStandardScaler]


/** Per-tenant linear rescale to [minValue, maxValue] (ref:
  * cyber/feature/scalers.py LinearScalarScaler). */
class PerTenantMinMaxScaler(override val uid: String) extends Transformer
    with HasTenantCol with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PerTenantMinMaxScaler"))

  final val minValue = new DoubleParam(this, "minValue", "output min")
  setDefault(minValue -> 0.0)
  def setMinValue(v: Double): this.type = set(minValue, v)
  final val maxValue = new DoubleParam(this, "maxValue", "output max")
  setDefault(maxValue -> 1.0)
  def setMaxValue(v: Double): this.type = set(maxValue, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val x = col(getInputCol).cast("double")
    val stats = df.groupBy(col(getTenantCol))
      .agg(min(x).as("__lo"), max(x).as("__hi"))
    df.join(broadcast(stats), getTenantCol)
      .withColumn(getOutputCol,
        when(col("__hi") === col("__lo"), lit($(minValue)))
          .otherwise(lit($(minValue)) +
            (x - col("__lo")) / (col("__hi") - col("__lo")) *
            (lit($(maxValue)) - lit($(minValue)))))
      .drop("__lo", "__hi")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, DoubleType))
  override def copy(extra: ParamMap): PerTenantMinMaxScaler = defaultCopy(extra)
}
object PerTenantMinMaxScaler extends graft.core.GraftReadable[PerTenantMinMaxScaler]


/** Per-tenant contiguous id assignment (ref: cyber/feature/indexers.py
  * IdIndexer): dense_rank of the value within its tenant, 1-based —
  * deterministic, no zipWithIndex, one shuffle on (tenant). */
class PerTenantIdIndexer(override val uid: String) extends Transformer
    with HasTenantCol with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PerTenantIdIndexer"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val w = Window.partitionBy(col(getTenantCol)).orderBy(col(getInputCol))
    df.withColumn(getOutputCol, dense_rank().over(w).cast("int"))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, IntegerType))
  override def copy(extra: ParamMap): PerTenantIdIndexer = defaultCopy(extra)
}
object PerTenantIdIndexer extends graft.core.GraftReadable[PerTenantIdIndexer]


/** Complement sampler for access graphs (ref:
  * cyber/anomaly/complement_access.py): per tenant, emit (user, res)
  * pairs that were NOT observed — candidate negatives for anomaly
  * scoring. The per-tenant cross join is bounded by `maxComplementRatio`
  * × observed size via deterministic hash-order sampling, the skew guard
  * that keeps a dense tenant from going quadratic.
  */
class ComplementAccessTransformer(override val uid: String) extends Transformer
    with HasTenantCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ComplementAccess"))

  final val userCol = new Param[String](this, "userCol", "user column")
  setDefault(userCol -> "user")
  def setUserCol(v: String): this.type = set(userCol, v)
  final val resCol = new Param[String](this, "resCol", "resource column")
  setDefault(resCol -> "res")
  def setResCol(v: String): this.type = set(resCol, v)
  final val maxComplementRatio = new DoubleParam(this, "maxComplementRatio",
    "cap complement size at ratio × observed pairs (0 = no cap)")
  setDefault(maxComplementRatio -> 0.0)
  def setMaxComplementRatio(v: Double): this.type = set(maxComplementRatio, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val t = col(getTenantCol); val u = col($(userCol)); val r = col($(resCol))
    val observed = df.select(t, u, r).distinct()
    val users = observed.select(t, u).distinct()
    val res = observed.select(t, r).distinct()
    val all = users.join(res, getTenantCol)
    val complement = all.join(observed,
      Seq(getTenantCol, $(userCol), $(resCol)), "left_anti")
    if ($(maxComplementRatio) <= 0) complement
    else {
      val nObs = observed.groupBy(t).agg(count(lit(1)).as("__n_obs"))
      val w = Window.partitionBy(t).orderBy(xxhash64(u, r))
      complement.join(broadcast(nObs), getTenantCol)
        .withColumn("__rn", row_number().over(w))
        .filter(col("__rn") <= col("__n_obs") * $(maxComplementRatio))
        .drop("__rn", "__n_obs")
    }
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(schema(getTenantCol), schema($(userCol)), schema($(resCol))))
  override def copy(extra: ParamMap): ComplementAccessTransformer = defaultCopy(extra)
}
object ComplementAccessTransformer extends graft.core.GraftReadable[ComplementAccessTransformer]


/** ALS-embedding access-anomaly scorer (ref:
  * cyber/anomaly/collaborative_filtering.py:472-890 AccessAnomaly):
  * factorize the (user, resource, count) access graph with implicit-
  * feedback ALS, score pairs by the factor dot product, and z-score the
  * result per tenant — low/negative scores flag accesses the embedding
  * considers unlikely.
  *
  * Cache lifecycle: transform() persists the encoded access frame because
  * two actions consume it (the ALS fit here, and the caller's action over
  * the scored output) — and it CANNOT be unpersisted before return, since
  * the scored output's lineage still reads it. The block
  * (MEMORY_AND_DISK, sized |distinct access triples|) is therefore left
  * cached; memory-resident parts yield to LRU but disk-resident parts
  * live until the session ends or the caller materializes the scored
  * output and runs `spark.catalog.clearCache()`. Repeated transform()
  * calls in one long-lived session accumulate one such block each.
  */
class AccessAnomaly(override val uid: String) extends Transformer
    with HasTenantCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("AccessAnomaly"))

  final val userCol = new Param[String](this, "userCol", "user column")
  setDefault(userCol -> "user")
  def setUserCol(v: String): this.type = set(userCol, v)
  final val resCol = new Param[String](this, "resCol", "resource column")
  setDefault(resCol -> "res")
  def setResCol(v: String): this.type = set(resCol, v)
  final val rank = new IntParam(this, "rank", "ALS rank")
  setDefault(rank -> 8)
  def setRank(v: Int): this.type = set(rank, v)
  final val seed = new LongParam(this, "seed", "ALS seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)
  final val maxIter = new IntParam(this, "maxIter", "ALS iterations")
  setDefault(maxIter -> 10)
  def setMaxIter(v: Int): this.type = set(maxIter, v)
  // ALS parallelism: blocks bound tasks-per-stage across the ~4/iteration
  // shuffle stages. The wall on a SMALL (gate-scale) graph is pure task
  // scheduling — 10 blocks × 57 stages of sub-ms work — so gates set 2;
  // at cluster scale size it so one block's factors fit an executor core.
  final val numBlocks = new IntParam(this, "numBlocks",
    "ALS user/item block count (parallelism)", ParamValidators.gtEq(1))
  setDefault(numBlocks -> 10)
  def setNumBlocks(v: Int): this.type = set(numBlocks, v)
  final val outputCol = new Param[String](this, "outputCol", "score column")
  setDefault(outputCol -> "anomaly_score")
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    // integer-encode users and resources (ALS needs int ids); tenant is
    // folded into the user/res encoding so one ALS fit covers all tenants
    // (the reference fits per-tenant; folding keeps one distributed job)
    val counts = df.groupBy(col(getTenantCol), col($(userCol)), col($(resCol)))
      .agg(count(lit(1)).cast("float").as("__cnt"))
    // distributed contiguous int ids: global sort + zipWithIndex (a global
    // dense_rank window would funnel every distinct key through one task)
    def addIndex(d: DataFrame, name: String): DataFrame = {
      val sorted = d.orderBy(d.columns.map(col).toIndexedSeq: _*)
      val rdd = sorted.rdd.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1).toInt)
      }
      d.sparkSession.createDataFrame(rdd,
        StructType(d.schema :+ StructField(name, IntegerType)))
    }
    val uIdx = addIndex(
      counts.select(col(getTenantCol), col($(userCol))).distinct(), "__uid")
    val rIdx = addIndex(
      counts.select(col(getTenantCol), col($(resCol))).distinct(), "__rid")
    // Persisted because TWO actions consume it — the ALS fit and the
    // caller's action over the scored output. Without it the whole
    // pre-ALS lineage (groupBy, two sort+zipWithIndex id jobs, two
    // joins) re-runs for the second action: ~15 extra stages that
    // dominated gate-scale wall. Size is |distinct access pairs| —
    // MEMORY_AND_DISK spills rather than OOMs at cluster scale; the fit
    // materializes it, LRU eviction reclaims it.
    val encoded = counts
      .join(uIdx, Seq(getTenantCol, $(userCol)))
      .join(rIdx, Seq(getTenantCol, $(resCol)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val als = new org.apache.spark.ml.recommendation.ALS()
      .setUserCol("__uid").setItemCol("__rid").setRatingCol("__cnt")
      .setRank($(rank)).setSeed($(seed)).setImplicitPrefs(true)
      .setMaxIter($(maxIter)).setColdStartStrategy("nan")
      .setNumUserBlocks($(numBlocks)).setNumItemBlocks($(numBlocks))
    val model = als.fit(encoded) // forces encoded's materialization
    val scored = model.transform(encoded)
      .withColumnRenamed("prediction", "__raw")
    // per-tenant z-score of the raw likelihood; anomaly = negated z
    new PerTenantStandardScaler().setTenantCol(getTenantCol)
      .setInputCol("__raw").setOutputCol("__z")
      .transform(scored)
      .withColumn($(outputCol), -col("__z"))
      .drop("__raw", "__z", "__cnt", "__uid", "__rid")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), DoubleType))
  override def copy(extra: ParamMap): AccessAnomaly = defaultCopy(extra)
}
object AccessAnomaly extends graft.core.GraftReadable[AccessAnomaly]

