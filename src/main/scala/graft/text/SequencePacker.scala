package graft.text

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Token-budget sequence packing: assigns each document to a training
  * sequence so that consecutive (by id) documents share a sequence while
  * their summed token lengths fit `maxTokens` — the standard packing step
  * that turns a curated corpus into fixed-budget LM training rows (public
  * practice, e.g. the T5/GPT "example packing" appendices). Beyond the
  * reference's surface; see builder brief.
  *
  * Packing is greedy and sequential BY CONSTRUCTION (first-fit in id
  * order), so the scale unit is the packing group: rows are packed
  * independently within each (`groupCol`, shard) cell, where `numShards`
  * sub-shards each group by a hash of the id. One shuffle (repartition on
  * the cell key), an in-partition sort, and a streaming single-pass scan —
  * no state beyond one running counter, so a cell of any row count streams
  * through. Sequences never span cells; with `numShards` > 1 that is the
  * deliberate trade (marginally more partially-filled sequences for
  * arbitrary within-group parallelism). Deterministic for a given
  * (maxTokens, groupCol, numShards) regardless of input partitioning.
  *
  * Output: input columns + `seq_shard` (int, the sub-shard) + `outputCol`
  * (long, 0-based sequence index unique within its (group, shard) cell).
  * A document longer than `maxTokens` opens its own (overfull) sequence
  * rather than being dropped — flag or split upstream ([[TokenChunker]])
  * when that matters.
  */
class SequencePacker(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("SequencePacker"))
  setDefault(outputCol -> "seq_id")

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val maxTokens = new IntParam(this, "maxTokens",
    "token budget per packed sequence", ParamValidators.gt(0))
  setDefault(maxTokens -> 2048)
  def setMaxTokens(v: Int): this.type = set(maxTokens, v)
  /** Optional precomputed token-length column; when unset, the whitespace
    * token count of `inputCol` is used ([[TextFunctions.tokenCount]]). */
  final val lengthCol = new Param[String](this, "lengthCol",
    "numeric token-length column (computed from inputCol when unset)")
  def setLengthCol(v: String): this.type = set(lengthCol, v)
  final val groupCol = new Param[String](this, "groupCol",
    "packing group column (sequences never cross groups)")
  def setGroupCol(v: String): this.type = set(groupCol, v)
  final val numShards = new IntParam(this, "numShards",
    "hash sub-shards per group — the within-group parallelism knob",
    ParamValidators.gt(0))
  setDefault(numShards -> 1)
  def setNumShards(v: Int): this.type = set(numShards, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    // output columns must be fresh: a pre-existing seq_shard / outputCol
    // would silently collide with withColumn's replace-in-place semantics
    // and corrupt the positional scan below
    require(!df.columns.contains("seq_shard") &&
      !df.columns.contains(getOutputCol),
      s"input already has a 'seq_shard' or '$getOutputCol' column — " +
        "rename it (or setOutputCol) before packing")
    val lenExpr =
      if (isSet(lengthCol)) col($(lengthCol)).cast("long")
      else TextFunctions.tokenCount(col(getInputCol)).cast("long")
    val grpExpr =
      if (isSet(groupCol)) col($(groupCol)).cast("string") else lit("")
    val shardExpr =
      if ($(numShards) > 1)
        pmod(xxhash64(col($(idCol)).cast("long")), lit($(numShards))).cast("int")
      else lit(0)

    // internal scratch columns get collision-proof names; seq_shard is
    // fresh by the require above
    val grpCol = graft.core.DatasetExtensions.findUnusedColumnName("__grp", df)
    val lenCol = graft.core.DatasetExtensions.findUnusedColumnName("__len", df)
    val withKeys = df
      .withColumn(grpCol, grpExpr)
      .withColumn("seq_shard", shardExpr)
      .withColumn(lenCol, lenExpr)
    val n = withKeys.columns.length
    val grpIdx = withKeys.columns.indexOf(grpCol)
    val shardIdx = withKeys.columns.indexOf("seq_shard")
    val lenIdx = withKeys.columns.indexOf(lenCol)
    val budget = $(maxTokens).toLong

    val outSchema = StructType(
      df.schema.fields ++ Seq(
        StructField("seq_shard", IntegerType, nullable = false),
        StructField(getOutputCol, LongType, nullable = false)))
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))

    // one exchange on the cell key, in-partition sort by id, then a
    // single streaming pass: O(1) state per cell, any cell size streams
    withKeys
      .repartition(col(grpCol), col("seq_shard"))
      .sortWithinPartitions(col(grpCol), col("seq_shard"),
        col($(idCol)).cast("long"))
      .mapPartitions { it =>
        var curGrp: String = null
        var curShard = Int.MinValue
        var bin = 0L
        var acc = 0L
        var first = true
        it.map { r =>
          val g = r.getString(grpIdx)
          val s = r.getInt(shardIdx)
          val len = if (r.isNullAt(lenIdx)) 0L else r.getLong(lenIdx)
          if (first || g != curGrp || s != curShard) {
            curGrp = g; curShard = s; bin = 0L; acc = len; first = false
          } else if (acc + len <= budget) {
            acc += len
          } else {
            bin += 1L; acc = len
          }
          Row.fromSeq((0 until n - 3).map(r.get) :+ s :+ bin)
        }
      }(enc)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema.fields ++ Seq(
      StructField("seq_shard", IntegerType, nullable = false),
      StructField(getOutputCol, LongType, nullable = false)))
  override def copy(extra: ParamMap): SequencePacker = defaultCopy(extra)
}
object SequencePacker extends graft.core.GraftReadable[SequencePacker]
