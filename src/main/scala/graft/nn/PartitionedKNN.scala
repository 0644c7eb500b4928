package graft.nn

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{Vector => MLVector}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Exact k-NN with the corpus NEVER collected to the driver — the scale-out
  * exact path next to [[KNN]]'s driver-collected ball tree (ref:
  * nn/KNN.scala:1-126 fits by collecting; this operator keeps the same exact
  * Euclidean semantics with the corpus partitioned).
  *
  * Execution: the (small) query set is collected once — bounded by
  * `maxQueryRows` — and broadcast; each corpus partition builds a local
  * [[BallTree]] inside `mapPartitions` and answers every query against its
  * slice (per-partition exact top-k, pruned tree search, no pairwise scan);
  * a map-side-combining bounded top-k aggregator then merges the per-
  * partition candidates per query. Total shuffle is k rows per
  * (query × partition) — independent of corpus size — and the corpus is
  * read exactly once with no exchange, so the plan survives a 1000-executor
  * / 100 TB corpus where [[KNN]]'s driver collect cannot.
  *
  * Exactness: the global top-k is contained in the union of per-partition
  * top-k sets, so the merge over per-partition exact results is exact.
  * Ordering is (distance asc, id asc), deterministic across partitionings.
  */
class PartitionedKNN(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PartitionedKNN"))
  setDefault(outputCol -> "matches")

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val k = new IntParam(this, "k", "neighbors", ParamValidators.gt(0))
  setDefault(k -> 5)
  def setK(v: Int): this.type = set(k, v)
  final val leafSize = new IntParam(this, "leafSize", "ball tree leaf size")
  setDefault(leafSize -> 50)
  def setLeafSize(v: Int): this.type = set(leafSize, v)

  /** The query side IS driver-collected (it rides a broadcast); this bound
    * keeps that explicit. The corpus side has no bound — it never moves.
    * Broadcast lifecycle: the query broadcast is referenced only by the
    * returned frame's task closures, so Spark's ContextCleaner reclaims
    * its blocks once the frame is garbage-collected — per-call broadcasts
    * don't accumulate across repeated transform() calls. */
  final val maxQueryRows = new LongParam(this, "maxQueryRows",
    "fail transform() when the query set exceeds this many rows",
    ParamValidators.gt(0))
  setDefault(maxQueryRows -> 1000000L)
  def setMaxQueryRows(v: Long): this.type = set(maxQueryRows, v)

  private var queriesDf: DataFrame = _
  /** (queryIdCol, vectorCol) frame; must be broadcastable. */
  def setQueries(df: DataFrame, queryIdCol: String, vecCol: String): this.type = {
    queriesDf = df.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    this
  }

  private def asDoubleArray(df: DataFrame, c: String) =
    df.schema(c).dataType match {
      case _: ArrayType => col(c).cast(ArrayType(DoubleType))
      case _ => org.apache.spark.ml.functions.vector_to_array(col(c))
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    import spark.implicits._
    require(queriesDf != null, "setQueries must be called before transform")
    val bound = math.min($(maxQueryRows), Int.MaxValue - 1L).toInt
    val qRows = queriesDf
      .select(col("query_id").cast("long"), asDoubleArray(queriesDf, "__qv"))
      .limit(bound + 1).as[(Long, Array[Double])].collect()
    require(qRows.length <= bound,
      s"PartitionedKNN would broadcast more than $bound query rows " +
        "(raise with setMaxQueryRows if executors have headroom).")
    val qBc = spark.sparkContext.broadcast(qRows)
    val kk = $(k)
    val leaf = $(leafSize)

    val corpus = df
      .select(asDoubleArray(df, getInputCol), col($(idCol)).cast("long"))
      .as[(Array[Double], Long)]
    // per-partition exact top-k: one local tree per corpus slice, every
    // query searched against it; emits (query_id, -distance, id)
    val partial = corpus.mapPartitions { it =>
      val rows = it.toArray
      if (rows.isEmpty) Iterator.empty
      else {
        val tree =
          new BallTree(rows.map(_._1), rows.map(_._2), Array.empty[Int], leaf)
        qBc.value.iterator.flatMap { case (qid, qv) =>
          tree.search(qv, kk).iterator.map { case (d, id) => (qid, -d, id) }
        }
      }
    }.toDF("query_id", "score", "id")

    // (score desc, id asc) on negated distance == (distance asc, id asc)
    val topk = udaf(new graft.sim.TopKAggregator(kk),
      Encoders.product[graft.sim.Scored])
    partial.groupBy("query_id")
      .agg(topk(col("score"), col("id")).as("__raw"))
      .select(col("query_id"), transform_(col("__raw"), s =>
        struct((-s("score")).as("distance"), s("id").as("id"))).as(getOutputCol))
  }

  private def transform_(c: org.apache.spark.sql.Column,
      f: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
    org.apache.spark.sql.functions.transform(c, f)

  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField("query_id", LongType),
      StructField(getOutputCol, ArrayType(StructType(Seq(
        StructField("distance", DoubleType), StructField("id", LongType)))))))
  override def copy(extra: ParamMap): PartitionedKNN = {
    val c = new PartitionedKNN(uid); c.queriesDf = queriesDf
    copyValues(c, extra)
  }
}
object PartitionedKNN extends graft.core.GraftReadable[PartitionedKNN]
