package graft.sim

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Vector similarity primitives over `array<float>` embedding columns —
  * backed by the codegen'd single-pass Catalyst expressions in
  * [[graft.functions.VectorExpressions]] (Spark's built-in higher-order
  * functions are interpreted + boxing per element, ~20× slower on a
  * similarity join's pair stream).
  */
object SimilarityFunctions {
  import graft.functions.VectorExpressions

  def dot(a: Column, b: Column): Column = VectorExpressions.dot(a, b)

  def l2Norm(a: Column): Column = VectorExpressions.l2Norm(a)

  def cosine(a: Column, b: Column): Column = VectorExpressions.cosine(a, b)

  def l2Distance(a: Column, b: Column): Column = VectorExpressions.l2Distance(a, b)

  /** Deterministic pseudo-random unit hyperplanes (driver-side, tiny). */
  def randomPlanes(n: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(n)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit signature of `v` against the fixed hyperplanes, packed into
    * one long — all planes in one primitive pass. */
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column =
    VectorExpressions.hyperplaneSignature(v, planes)
}

/** Bounded top-k accumulator: keeps the k best (score desc, id asc) pairs.
  * Used as a typed `Aggregator` so Spark does map-side partial top-k per
  * partition and only shuffles k rows per (group × partition) — the
  * scale-correct alternative to a global window sort.
  * (Pattern ref: nn/BoundedPriorityQueue.scala:1-65 in the reference.)
  */
case class Scored(score: Double, id: Long)

class TopKAggregator(k: Int)
    extends Aggregator[Scored, Seq[Scored], Seq[Scored]] {
  // total order (score desc, id asc); duplicate ids collapse to one entry so
  // a candidate colliding in several LSH bands can't crowd out real neighbors
  private def cap(s: Seq[Scored]): Seq[Scored] =
    s.sortBy(x => (-x.score, x.id)).distinctBy(_.id).take(k)
  override def zero: Seq[Scored] = Vector.empty
  override def reduce(b: Seq[Scored], a: Scored): Seq[Scored] =
    // shortcut only when a strictly loses to the k-th element under the
    // same (score desc, id asc) order cap() enforces
    if (b.size >= k && (b.last.score > a.score ||
        (b.last.score == a.score && b.last.id <= a.id))) b
    else cap(b :+ a)
  override def merge(x: Seq[Scored], y: Seq[Scored]): Seq[Scored] = cap(x ++ y)
  override def finish(r: Seq[Scored]): Seq[Scored] = cap(r)
  override def bufferEncoder: Encoder[Seq[Scored]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Scored]]()
  override def outputEncoder: Encoder[Seq[Scored]] = bufferEncoder
}

/** Brute-force cosine top-k neighbor search: a small query set (broadcast)
  * against the full corpus. Plan: broadcast-nested-loop join (corpus never
  * shuffles) → cosine expression → top-k Aggregator grouped by query id.
  * This is the exact baseline; `LSHNearestNeighbors` is the scale path.
  *
  * Input-cost caveat: the BNL join duplicates every corpus row once per
  * query, and Catalyst evaluates an un-materialized expensive input
  * column (an embedding UDF) per JOINED PAIR — `localCheckpoint()` such
  * an upstream first (measured in the image_knn gate: 349 → 5 s; the
  * [[graft.dedup.SemDeDup]] convention).
  */
class NearestNeighbors(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("NearestNeighbors"))

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val k = new IntParam(this, "k", "neighbors per query",
    ParamValidators.gt(0))
  setDefault(k -> 10)
  def setK(v: Int): this.type = set(k, v)

  private var queriesDf: DataFrame = _
  /** (queryIdCol, vectorCol) frame; must be small enough to broadcast. */
  def setQueries(df: DataFrame, queryIdCol: String, vecCol: String): this.type = {
    queriesDf = df.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    this
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    val sim = SimilarityFunctions.cosine(col("__qv"), col(getInputCol))
    val topk = udaf(new TopKAggregator($(k)), Encoders.product[Scored])
    val scored = df.join(broadcast(queriesDf))
      .select(col("query_id"), sim.as("score"), col($(idCol)).cast("long").as("id"))
    scored.groupBy("query_id")
      .agg(topk(col("score"), col("id")).as("neighbors"))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbors", ArrayType(StructType(Seq(
        StructField("score", DoubleType), StructField("id", LongType)))))))
  override def copy(extra: ParamMap): NearestNeighbors = {
    val c = new NearestNeighbors(uid); c.queriesDf = queriesDf
    copyValues(c, extra)
  }
}
object NearestNeighbors extends graft.core.GraftReadable[NearestNeighbors]


/** LSH-bucketed approximate nearest neighbors: hyperplane signatures with
  * multiple band tables; queries (broadcast) probe only their buckets, so
  * per-query work is O(bucket) not O(corpus). Recall is tunable via
  * (numPlanes, bands).
  */
class LSHNearestNeighbors(override val uid: String) extends Transformer
    with HasInputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("LSHNearestNeighbors"))

  final val idCol = new Param[String](this, "idCol", "corpus id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val k = new IntParam(this, "k", "neighbors per query")
  setDefault(k -> 10)
  def setK(v: Int): this.type = set(k, v)
  // 64 planes over 4 bands = 16 sign bits per band: 65,536 bucket values
  // per table, so a query probes ~corpus/2^16 per band instead of the
  // corpus/16 a 4-bit band would touch — the scale-correct default; drop
  // numPlanes for tiny corpora where recall beats bucket sparsity
  final val numPlanes = new IntParam(this, "numPlanes", "hyperplanes")
  setDefault(numPlanes -> 64)
  def setNumPlanes(v: Int): this.type = set(numPlanes, v)
  final val bands = new IntParam(this, "bands", "band tables")
  setDefault(bands -> 4)
  def setBands(v: Int): this.type = set(bands, v)
  final val seed = new LongParam(this, "seed", "plane seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)

  private var queriesDf: DataFrame = _
  def setQueries(df: DataFrame, queryIdCol: String, vecCol: String): this.type = {
    queriesDf = df.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
    this
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    import SimilarityFunctions._
    val df = ds.toDF()
    val dim = df.select(size(col(getInputCol))).head().getInt(0)
    val planes = randomPlanes($(numPlanes), dim, $(seed))
    val bits = $(numPlanes) / $(bands)
    def bandCols(v: Column): Column = {
      val sig = hyperplaneSignature(v, planes)
      array((0 until $(bands)).map { b =>
        struct(lit(b).as("bi"),
          shiftright(sig, b * bits).bitwiseAND(lit((1L << bits) - 1)).as("bv"))
      }: _*)
    }
    val corpus = df.select(col($(idCol)).cast("long").as("id"),
        col(getInputCol).as("__cv"),
        explode(bandCols(col(getInputCol))).as("__band"))
    val qs = queriesDf.select(col("query_id"), col("__qv"),
      explode(bandCols(col("__qv"))).as("__band"))
    val sim = cosine(col("__qv"), col("__cv"))
    val topk = udaf(new TopKAggregator($(k)), Encoders.product[Scored])
    corpus.join(broadcast(qs), Seq("__band"))
      .select(col("query_id"), sim.as("score"), col("id"))
      .groupBy("query_id")
      .agg(topk(col("score"), col("id")).as("neighbors"))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField("query_id", LongType),
      StructField("neighbors", ArrayType(StructType(Seq(
        StructField("score", DoubleType), StructField("id", LongType)))))))
  override def copy(extra: ParamMap): LSHNearestNeighbors = {
    val c = new LSHNearestNeighbors(uid); c.queriesDf = queriesDf
    copyValues(c, extra)
  }
}
object LSHNearestNeighbors extends graft.core.GraftReadable[LSHNearestNeighbors]

