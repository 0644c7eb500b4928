package graft.sim

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Mean-pools embedding vectors per group — the standard reduction from
  * many vectors (token/chunk/member embeddings) to one (document/user
  * centroid). (Beyond the reference's surface; LLM-pipeline brief.)
  *
  * Plan: `posexplode` to narrow `(group, dim, value)` rows, ONE
  * map-side-combinable aggregation of exact decimal sums per
  * `(group, dim)`, then per-group reassembly via a sorted `collect_list`
  * of (dim, mean) pairs. Per-dimension partial sums combine on the map
  * side, so the shuffle carries ~`groups × dim` pre-aggregated rows, not
  * `rows × dim` — at 100 TB the reduction happens before the wire.
  *
  * Determinism: each mean is an exact decimal sum with ONE double
  * divide ([[Determinism.deterministicMean]]), so pooled vectors are
  * identical across partitionings, retries, and engines.
  */
class EmbeddingMeanPooler(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("EmbeddingMeanPooler"))
  setDefault(outputCol -> "pooled")

  final val groupCols = new StringArrayParam(this, "groupCols",
    "grouping key columns")
  def setGroupCols(v: Array[String]): this.type = set(groupCols, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(groupCols) && $(groupCols).nonEmpty, "setGroupCols first")
    val df = ds.toDF()
    val groups = $(groupCols).toSeq.map(col)
    df.select(groups :+ posexplode(col(getInputCol)).as(Seq("__dim", "__v")): _*)
      .groupBy(groups :+ col("__dim"): _*)
      .agg(Determinism.deterministicMean(col("__v").cast("double")).as("__mean"))
      .groupBy(groups: _*)
      .agg(org.apache.spark.sql.functions.transform(
        sort_array(collect_list(struct(col("__dim"), col("__mean")))),
        p => p.getField("__mean")).as(getOutputCol))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType($(groupCols).map(schema(_)).toIndexedSeq :+
      StructField(getOutputCol, ArrayType(DoubleType)))
  override def copy(extra: ParamMap): EmbeddingMeanPooler = defaultCopy(extra)
}
object EmbeddingMeanPooler extends graft.core.GraftReadable[EmbeddingMeanPooler]

