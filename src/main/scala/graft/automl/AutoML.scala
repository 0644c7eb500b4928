package graft.automl

import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.ml.param.{Param, ParamMap}
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

/** Randomized hyperparameter space builder (ref:
  * automl/HyperparamBuilder.scala:1-113, ParamSpace.scala): declare
  * discrete or continuous ranges per Param, then draw seeded random
  * ParamMaps.
  */
sealed trait HyperParamDist[T] { def sample(rng: scala.util.Random): T }
case class DiscreteHyperParam[T](values: Seq[T]) extends HyperParamDist[T] {
  def sample(rng: scala.util.Random): T = values(rng.nextInt(values.length))
}
case class RangeHyperParam(lo: Double, hi: Double) extends HyperParamDist[Double] {
  def sample(rng: scala.util.Random): Double = lo + (hi - lo) * rng.nextDouble()
}
case class IntRangeHyperParam(lo: Int, hi: Int) extends HyperParamDist[Int] {
  def sample(rng: scala.util.Random): Int = lo + rng.nextInt(hi - lo)
}

class HyperparamBuilder {
  private val dists =
    scala.collection.mutable.ArrayBuffer.empty[(Param[_], HyperParamDist[_])]
  def addHyperparam[T](p: Param[T], d: HyperParamDist[T]): this.type = {
    dists += ((p, d)); this
  }
  /** Draw n random ParamMaps (seeded, reproducible). */
  def build(n: Int, seed: Long = 42L): Array[ParamMap] = {
    val rng = new scala.util.Random(seed)
    Array.fill(n) {
      val pm = ParamMap.empty
      dists.foreach { case (p, d) =>
        pm.put(p.asInstanceOf[Param[Any]], d.sample(rng))
      }
      pm
    }
  }
}

/** Result frame schema: (estimator, paramMap, fold, metric). */
case class TuneResult(bestModel: Transformer, bestEstimator: String,
                      bestParams: ParamMap, bestMetric: Double,
                      results: DataFrame)

/** Randomized grid search over MULTIPLE estimators × k-fold CV with
  * driver thread-pool parallelism (ref: automl/TuneHyperparameters
  * .scala:36-254 — same structure: candidate (estimator, params) pairs ×
  * folds fanned out over a pool; Spark schedules the concurrent fit jobs).
  * Folds are assigned with `rand(seed)` — deterministic for a fixed input
  * partitioning.
  */
class TuneHyperparameters(
    val candidates: Seq[(String, Estimator[_ <: Model[_]], Array[ParamMap])],
    val evaluator: DataFrame => Double,
    val numFolds: Int = 3,
    val seed: Long = 42L,
    val parallelism: Int = 8,
    val maximize: Boolean = true) {

  def fit(ds: Dataset[_]): TuneResult = {
    val df = ds.toDF()
    val folded = df.withColumn("__fold",
      (rand(seed) * numFolds).cast("int")).cache()
    folded.count()
    val pool = java.util.concurrent.Executors.newFixedThreadPool(parallelism)
    val rows = try {
      implicit val ec: ExecutionContext = ExecutionContext.fromExecutor(pool)
      val tasks = for {
        (name, est, grids) <- candidates
        (pm, gi) <- grids.zipWithIndex
        fold <- 0 until numFolds
      } yield Future {
        val train = folded.filter(col("__fold") =!= fold).drop("__fold")
        val test = folded.filter(col("__fold") === fold).drop("__fold")
        val model = est.copy(pm).fit(train).asInstanceOf[Transformer]
        val metric = evaluator(model.transform(test))
        (name, gi, pm, fold, metric)
      }
      Await.result(Future.sequence(tasks), Duration.Inf)
    } finally pool.shutdown() // non-daemon threads would pin the JVM open
    folded.unpersist()
    // mean metric per candidate
    val byCandidate = rows.groupBy(r => (r._1, r._2)).map { case ((n, gi), rs) =>
      (n, gi, rs.head._3, rs.map(_._5).sum / rs.size)
    }.toSeq.sortBy(r => (if (maximize) -r._4 else r._4, r._1, r._2))
    val (bestName, _, bestPm, bestMetric) = byCandidate.head
    // refit best on full data
    val bestEst = candidates.find(_._1 == bestName).get._2
    val bestModel = bestEst.copy(bestPm).fit(df).asInstanceOf[Transformer]
    val spark = df.sparkSession
    val resultRows = rows.map { case (n, gi, pm, fold, m) =>
      Row(n, gi, pm.toString, fold, m)
    }
    val schema = StructType(Seq(
      StructField("estimator", StringType), StructField("grid_index", IntegerType),
      StructField("params", StringType), StructField("fold", IntegerType),
      StructField("metric", DoubleType)))
    val results = spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(resultRows).asJava), schema)
    TuneResult(bestModel, bestName, bestPm, bestMetric, results)
  }
}

/** Evaluate already-fitted models on an eval frame and keep the best
  * (ref: automl/FindBestModel.scala:50-190). Returns the winner plus the
  * all-models metric frame the reference exposes.
  */
class FindBestModel(
    val models: Seq[(String, Transformer)],
    val evaluator: DataFrame => Double,
    val maximize: Boolean = true) {

  def fit(ds: Dataset[_]): (Transformer, DataFrame) = {
    val df = ds.toDF()
    val scored = models.map { case (name, m) =>
      (name, m, evaluator(m.transform(df)))
    }
    val best = scored.sortBy(r => (if (maximize) -r._3 else r._3, r._1)).head
    val spark = df.sparkSession
    val rows = scored.map { case (n, _, v) => Row(n, v) }
    val schema = StructType(Seq(StructField("model", StringType),
      StructField("metric", DoubleType)))
    (best._2, spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema))
  }
}

object Evaluators {
  /** Fraction of rows where `predCol` equals `labelCol`. */
  def accuracy(labelCol: String, predCol: String): DataFrame => Double =
    df => {
      val r = df.agg(
        sum(when(col(predCol) === col(labelCol), 1L).otherwise(0L)),
        count(lit(1))).head()
      if (r.getLong(1) == 0) 0.0 else r.getLong(0).toDouble / r.getLong(1)
    }

  /** RMSE between `predCol` and `labelCol`. */
  def rmse(labelCol: String, predCol: String): DataFrame => Double =
    df => math.sqrt(df.agg(avg(
      pow(col(predCol) - col(labelCol), 2.0))).head().getDouble(0))
}
