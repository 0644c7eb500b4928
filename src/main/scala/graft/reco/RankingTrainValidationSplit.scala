package graft.reco

import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** User-stratified train/validation split + grid evaluation over ranking
  * metrics (ref: recommendation/RankingTrainValidationSplit.scala:1-354).
  *
  * Split: per user, the top `holdoutFraction` of interactions by
  * (rating desc, item) become validation ground truth — every user keeps
  * training signal, matching the reference's stratification. One window
  * shuffle on user; the candidate loop drives whole SAR fits, which Spark
  * schedules as independent job sets.
  */
case class RankingSplitResult(bestModel: SARModel, bestParams: Map[String, Any],
                              bestNdcg: Double, results: DataFrame)

class RankingTrainValidationSplit(override val uid: String)
    extends HasRecoCols with Serializable {
  def this() = this(Identifiable.randomUID("RankingTVS"))

  final val k = new IntParam(this, "k", "evaluation cutoff")
  setDefault(k -> 5)
  def setK(v: Int): this.type = set(k, v)
  final val holdoutFraction = new DoubleParam(this, "holdoutFraction",
    "per-user share of interactions held out", ParamValidators.inRange(0, 1))
  setDefault(holdoutFraction -> 0.25)
  def setHoldoutFraction(v: Double): this.type = set(holdoutFraction, v)

  /** Grid over SAR settings: (similarityFunction, decayHalfLifeDays). */
  var grid: Seq[(String, Int)] = Seq(("jaccard", 30), ("lift", 30))
  def setGrid(g: Seq[(String, Int)]): this.type = { grid = g; this }

  final val timeCol = new Param[String](this, "timeCol", "optional decay time")
  def setTimeCol(v: String): this.type = set(timeCol, v)

  override def copy(extra: ParamMap): RankingTrainValidationSplit =
    defaultCopy(extra)

  def fit(ds: Dataset[_]): RankingSplitResult = {
    val df = ds.toDF()
    val spark = df.sparkSession
    // per-user stratified split: rank interactions, hold out the head
    val w = Window.partitionBy(col(getUserCol))
      .orderBy(col(getRatingCol).desc, col(getItemCol))
    val withRank = df
      .withColumn("__rn", row_number().over(w))
      .withColumn("__n", count(lit(1)).over(Window.partitionBy(col(getUserCol))))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val isHoldout = col("__rn") <= greatest(lit(1),
      ceil(col("__n") * $(holdoutFraction)))
    val train = withRank.filter(!isHoldout).drop("__rn", "__n")
    val gt = withRank.filter(isHoldout)
      .groupBy(col(getUserCol).as("user"))
      .agg(sort_array(collect_list(struct(col("__rn").as("r"),
        col(getItemCol).cast("string").as("i"))))
        .getField("i").as("ground_truth"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val evaluated = grid.map { case (simFn, halfLife) =>
      val sar = new SAR().setUserCol(getUserCol).setItemCol(getItemCol)
        .setRatingCol(getRatingCol).setSimilarityFunction(simFn)
        .setDecayHalfLifeDays(halfLife)
      if (isSet(timeCol)) sar.setTimeCol($(timeCol))
      val model = sar.fit(train)
      val recs = model.recommendForAllUsers($(k), removeSeen = false)
        .groupBy("user")
        .agg(sort_array(collect_list(struct(col("rank"),
          col("item").cast("string").as("i"))))
          .getField("i").as("recommendations"))
      val m = new RankingEvaluator().setK($(k))
        .transform(recs.join(gt, "user")).head
      (simFn, halfLife, model, m.getAs[Double]("ndcg_at_k"),
        m.getAs[Double]("map"), m.getAs[Double]("precision_at_k"))
    }
    withRank.unpersist()
    val best = evaluated.maxBy(r => (r._4, r._1))
    import spark.implicits._
    val results = evaluated
      .map(r => (r._1, r._2, r._4, r._5, r._6))
      .toDF("similarity", "half_life", "ndcg_at_k", "map", "precision_at_k")
    RankingSplitResult(best._3,
      Map("similarityFunction" -> best._1, "decayHalfLifeDays" -> best._2),
      best._4, results)
  }
}
