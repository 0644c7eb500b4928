package graft.text

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-group document-count cap — the quota half of cluster-balanced
  * curation (public recipes: DataComp-LM's topic rebalancing over
  * k-means clusters, Li et al. 2024; SemDeDup keeps a fixed share per
  * cluster): every group (a [[graft.sim.EmbeddingClusterer]] `cluster`,
  * a domain, a language) keeps at most `cap` documents, chosen by the
  * family's deterministic md5 draw — md5(id ":" salt) ascending, id
  * ascending on the (astronomically unlikely) digest tie. The same
  * documents survive across runs, cluster sizes, and partitionings; a
  * group under its cap passes through whole.
  *
  * Scale shape — the corpus is NEVER globally sorted and never rides a
  * window: a map-side-combining bottom-k aggregator (the
  * [[graft.sim.TopKAggregator]] pattern, inverted order) shuffles at
  * most cap × partitions rows per group to pick the survivor ids, and
  * one semi-join on the id brings the full rows back (kept ids total
  * groups × cap — at curation operating points that side is broadcast-
  * small, and AQE picks the broadcast plan on its own). Contrast with
  * `row_number() OVER (PARTITION BY group ...)`: that plan shuffles and
  * sorts the ENTIRE corpus payload per group.
  *
  * Reference analogue: none — the reference's closest shape is
  * StratifiedRepartition (per-class partition balance, not retention).
  * [[DomainMixtureSampler]] keeps a deterministic FRACTION per group;
  * this keeps a deterministic COUNT, the knob cluster-balance recipes
  * specify.
  *
  * The input lineage is evaluated twice (the quota draw and the
  * semi-join probe) — `localCheckpoint()` an expensive upstream (an
  * embedder or k-means assignment) before sampling, the
  * [[graft.dedup.SemDeDup]] convention.
  */
class GroupQuotaSampler(override val uid: String) extends Transformer
    with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("GroupQuotaSampler"))

  final val groupCol = new Param[String](this, "groupCol",
    "group column (cluster / domain / language)")
  def setGroupCol(v: String): this.type = set(groupCol, v)
  final val idCol = new Param[String](this, "idCol", "document id column")
  setDefault(idCol -> "doc_id")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val cap = new IntParam(this, "cap",
    "max documents kept per group", ParamValidators.gt(0))
  setDefault(cap -> 1000)
  def setCap(v: Int): this.type = set(cap, v)
  final val salt = new Param[String](this, "salt",
    "hash salt — vary to draw an independent sample")
  setDefault(salt -> "quota")
  def setSalt(v: String): this.type = set(salt, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    transformSchema(df.schema)
    val key = md5(concat(col($(idCol)).cast("string"), lit(":" + $(salt))))
    val bottomK = udaf(new BottomKAggregator($(cap)),
      Encoders.product[Drawn])
    // null groups form their own group (groupBy semantics) — a null
    // cluster (null embedding upstream) is still capped, not dropped
    val kept = df
      .select(col($(groupCol)).as("__gq_g"), key.as("__gq_key"),
        col($(idCol)).as("__gq_id"))
      .groupBy("__gq_g")
      .agg(bottomK(col("__gq_key"), col("__gq_id")).as("__gq_keep"))
      .select(explode(col("__gq_keep")).as("__gq_k"))
      .select(col("__gq_k.id").as("__gq_id"))
    df.join(kept, col($(idCol)) === col("__gq_id"), "left_semi")
  }

  override def transformSchema(schema: StructType): StructType = {
    require(schema.fieldNames.contains($(groupCol)),
      s"GroupQuotaSampler: missing group column '${$(groupCol)}'")
    require(schema.fieldNames.contains($(idCol)),
      s"GroupQuotaSampler: missing id column '${$(idCol)}'")
    schema
  }
  override def copy(extra: ParamMap): GroupQuotaSampler = defaultCopy(extra)
}
object GroupQuotaSampler extends graft.core.GraftReadable[GroupQuotaSampler]

/** One candidate of the quota draw: the md5-hex sort key and the id. */
case class Drawn(key: String, id: Long)

/** Bounded bottom-k accumulator over (key asc, id asc) — the
  * [[graft.sim.TopKAggregator]] contract with the order inverted and
  * string keys: map-side partials keep k per partition, so a group's
  * shuffle volume is k × partitions rows, never its population. */
class BottomKAggregator(k: Int)
    extends Aggregator[Drawn, Seq[Drawn], Seq[Drawn]] {
  private def lt(a: Drawn, b: Drawn): Boolean = {
    val c = a.key.compareTo(b.key)
    c < 0 || (c == 0 && a.id < b.id)
  }
  private def cap(s: Seq[Drawn]): Seq[Drawn] =
    s.sortWith(lt).distinctBy(_.id).take(k)
  override def zero: Seq[Drawn] = Vector.empty
  override def reduce(b: Seq[Drawn], a: Drawn): Seq[Drawn] =
    if (b.size >= k && lt(b.last, a)) b else cap(b :+ a)
  override def merge(x: Seq[Drawn], y: Seq[Drawn]): Seq[Drawn] = cap(x ++ y)
  override def finish(r: Seq[Drawn]): Seq[Drawn] = cap(r)
  override def bufferEncoder: Encoder[Seq[Drawn]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Drawn]]()
  override def outputEncoder: Encoder[Seq[Drawn]] = bufferEncoder
}
