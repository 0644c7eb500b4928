package graft.reco

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.{Aggregator, Window}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Builds per-user ground-truth top-k item lists from a ratings frame:
  * `Window.partitionBy(user).orderBy(rating desc, item)` + rank ≤ k +
  * `collect_list` (ref: recommendation/RankingAdapter.scala:124-145 — the
  * reference already uses exactly this plan; one shuffle on user).
  */
class RankingAdapter(override val uid: String) extends Transformer
    with HasRecoCols with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("RankingAdapter"))

  final val k = new IntParam(this, "k", "ground-truth depth",
    ParamValidators.gt(0))
  setDefault(k -> 10)
  def setK(v: Int): this.type = set(k, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val w = Window.partitionBy(getUserCol)
      .orderBy(col(getRatingCol).desc, col(getItemCol))
    df.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= $(k))
      .groupBy(col(getUserCol).as("user"))
      // re-sort inside the collected list: collect_list order after a
      // shuffle is not guaranteed, sort_array on (rank, item) struct is
      .agg(sort_array(collect_list(struct(col("__rank").as("r"),
        col(getItemCol).as("i")))).getField("i").as("ground_truth"))
  }
  override def transformSchema(schema: StructType): StructType = {
    val itemT = schema(getItemCol).dataType
    StructType(Seq(StructField("user", schema(getUserCol).dataType),
      StructField("ground_truth", ArrayType(itemT))))
  }
  override def copy(extra: ParamMap): RankingAdapter = defaultCopy(extra)
}
object RankingAdapter extends graft.core.GraftReadable[RankingAdapter]


/** Per-user ranking quality metrics, averaged with one typed Aggregator
  * (map-side partial means; nothing is collected to the driver) — the
  * DataFrame-native replacement for mllib RankingMetrics' RDD pass
  * (ref: recommendation/RankingEvaluator.scala:17-95).
  *
  * Metrics at k: precision, recall, MAP, NDCG (binary relevance, log2
  * discount), MRR, and fraction of users with ≥1 hit.
  */
object RankingMetricsAgg {
  case class PerUser(precisionAtK: Double, recallAtK: Double, ap: Double,
                     ndcg: Double, rr: Double, hit: Double)
  case class MetricsBuf(n: Long, p: Double, r: Double, map: Double,
                        ndcg: Double, mrr: Double, hitRate: Double)

  def perUser(rec: Seq[String], gt: Seq[String], k: Int): PerUser = {
    val recK = rec.take(k)
    val gtSet = gt.toSet
    if (gtSet.isEmpty) return PerUser(0, 0, 0, 0, 0, 0)
    var hits = 0; var ap = 0.0; var dcg = 0.0; var rr = 0.0
    var i = 0
    while (i < recK.length) {
      if (gtSet.contains(recK(i))) {
        hits += 1
        ap += hits.toDouble / (i + 1)
        dcg += 1.0 / (math.log(i + 2) / math.log(2))
        if (rr == 0.0) rr = 1.0 / (i + 1)
      }
      i += 1
    }
    val idcg = (0 until math.min(gtSet.size, k))
      .map(j => 1.0 / (math.log(j + 2) / math.log(2))).sum
    PerUser(
      precisionAtK = hits.toDouble / k,
      recallAtK = hits.toDouble / gtSet.size,
      ap = ap / math.min(gtSet.size, k),
      ndcg = if (idcg == 0) 0 else dcg / idcg,
      rr = rr,
      hit = if (hits > 0) 1.0 else 0.0)
  }

  class MeanAgg(k: Int)
      extends Aggregator[(Seq[String], Seq[String]), MetricsBuf, MetricsBuf] {
    override def zero: MetricsBuf = MetricsBuf(0, 0, 0, 0, 0, 0, 0)
    override def reduce(b: MetricsBuf, a: (Seq[String], Seq[String])): MetricsBuf = {
      val m = perUser(a._1, a._2, k)
      MetricsBuf(b.n + 1, b.p + m.precisionAtK, b.r + m.recallAtK,
        b.map + m.ap, b.ndcg + m.ndcg, b.mrr + m.rr, b.hitRate + m.hit)
    }
    override def merge(x: MetricsBuf, y: MetricsBuf): MetricsBuf =
      MetricsBuf(x.n + y.n, x.p + y.p, x.r + y.r, x.map + y.map,
        x.ndcg + y.ndcg, x.mrr + y.mrr, x.hitRate + y.hitRate)
    override def finish(b: MetricsBuf): MetricsBuf = b
    override def bufferEncoder: Encoder[MetricsBuf] = Encoders.product[MetricsBuf]
    override def outputEncoder: Encoder[MetricsBuf] = Encoders.product[MetricsBuf]
  }
}

/** Evaluates (recommendations, ground_truth) array columns into one metrics
  * row. Input: a frame with `recCol` and `gtCol` array<string> columns
  * (cast item ids to string upstream for type uniformity).
  */
class RankingEvaluator(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("RankingEvaluator"))

  final val recCol = new Param[String](this, "recCol", "recommendations col")
  setDefault(recCol -> "recommendations")
  def setRecCol(v: String): this.type = set(recCol, v)
  final val gtCol = new Param[String](this, "gtCol", "ground truth col")
  setDefault(gtCol -> "ground_truth")
  def setGtCol(v: String): this.type = set(gtCol, v)
  final val k = new IntParam(this, "k", "cutoff", ParamValidators.gt(0))
  setDefault(k -> 10)
  def setK(v: Int): this.type = set(k, v)
  /** Emit one row PER USER instead of the averaged single row — narrow
    * (no aggregation at all), fully deterministic (each metric is rounded
    * to 9 dp so last-ulp log/sum differences cannot surface), and thus
    * oracle-checkable. Requires `keyCol`. */
  final val perUserMetrics = new BooleanParam(this, "perUserMetrics", "")
  setDefault(perUserMetrics -> false)
  def setPerUserMetrics(v: Boolean): this.type = set(perUserMetrics, v)
  final val keyCol = new Param[String](this, "keyCol", "user key column")
  setDefault(keyCol -> "user")
  def setKeyCol(v: String): this.type = set(keyCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    import RankingMetricsAgg._
    val df = ds.toDF()
    if ($(perUserMetrics)) {
      val kV = $(k)
      val f = udf((rec: Seq[String], gt: Seq[String]) => perUser(rec, gt, kV))
      def r9(c: Column): Column = round(c, 9) + lit(0.0)
      df.select(col($(keyCol)), f(col($(recCol)), col($(gtCol))).as("__m"))
        .select(col($(keyCol)),
          r9(col("__m.precisionAtK")).as("precision_at_k"),
          r9(col("__m.recallAtK")).as("recall_at_k"),
          r9(col("__m.ap")).as("ap"),
          r9(col("__m.ndcg")).as("ndcg_at_k"),
          r9(col("__m.rr")).as("rr"),
          r9(col("__m.hit")).as("hit"))
    } else {
      val agg = udaf(new MeanAgg($(k)),
        Encoders.tuple(ExpressionEncoderHelper.seqString, ExpressionEncoderHelper.seqString))
      df.select(agg(col($(recCol)), col($(gtCol))).as("m"))
        .select(
          (col("m.p") / col("m.n")).as("precision_at_k"),
          (col("m.r") / col("m.n")).as("recall_at_k"),
          (col("m.map") / col("m.n")).as("map"),
          (col("m.ndcg") / col("m.n")).as("ndcg_at_k"),
          (col("m.mrr") / col("m.n")).as("mrr"),
          (col("m.hitRate") / col("m.n")).as("hit_rate"))
    }
  }
  override def transformSchema(schema: StructType): StructType =
    if ($(perUserMetrics))
      StructType(StructField($(keyCol),
          schema.find(_.name == $(keyCol)).map(_.dataType).getOrElse(StringType)) +:
        Seq("precision_at_k", "recall_at_k", "ap", "ndcg_at_k", "rr", "hit")
          .map(StructField(_, DoubleType)))
    else
      StructType(Seq("precision_at_k", "recall_at_k", "map", "ndcg_at_k",
        "mrr", "hit_rate").map(StructField(_, DoubleType)))
  override def copy(extra: ParamMap): RankingEvaluator = defaultCopy(extra)
}
object RankingEvaluator extends graft.core.GraftReadable[RankingEvaluator]


private[reco] object ExpressionEncoderHelper {
  val seqString: Encoder[Seq[String]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
}
