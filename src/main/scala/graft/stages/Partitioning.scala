package graft.stages

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.LinkedBlockingQueue

/** Per-label exact resampling + spread so every partition sees every label
  * (ref: core/.../stages/StratifiedRepartition.scala:48-77; modes
  * equal/original/mixed).
  *
  * Modes:
  *  - `original`: keep every row (fraction 1.0, no replacement), only spread
  *    labels across partitions.
  *  - `equal`: sample **with replacement** at fraction
  *    `max(maxLabelCount, numPartitions) / count(label)` — upsamples every
  *    label to the majority count (ref:
  *    StratifiedRepartition.scala:76-79 `getEqualLabelCount`).
  *  - `mixed`: the equal fractions normalized to mean 1.0 — partially boosts
  *    minority labels while keeping total row count roughly unchanged.
  *    (Documented divergence: the reference's mixed formula
  *    (StratifiedRepartition.scala:57-60) divides raw counts by a mean of
  *    fractions, yielding fractions in the thousands — we use the evident
  *    intent, a normalized blend, instead.)
  *
  * The spread step assigns each row a per-label running index and hash
  * partitions on it — one shuffle, every label lands on every partition
  * (the RangePartitioner trick of StratifiedRepartition.scala:66-70
  * expressed as a single hash partitioning).
  */
class StratifiedRepartition(override val uid: String) extends Transformer
    with HasLabelCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("StratifiedRepartition"))

  final val mode = new Param[String](this, "mode", "equal | original | mixed",
    ParamValidators.inArray(Array("equal", "original", "mixed")))
  setDefault(mode -> "original")
  def setMode(v: String): this.type = set(mode, v)
  final val seed = new LongParam(this, "seed", "sampling seed")
  setDefault(seed -> 1234L)
  def setSeed(v: Long): this.type = set(seed, v)
  // legacy path: RDD sampleByKeyExact + round-robin HashPartitioner.
  // Exact per-label counts, but it de-codegens the pipeline (every row
  // round-trips through Row) and pays sampleByKeyExact's count+sample
  // double pass. The default path keeps whole-stage codegen: Bernoulli /
  // Poisson per-label sampling and a random spread key, one Exchange.
  //
  // BEHAVIOR CHANGE vs pre-0.1 snapshots (and vs the reference, which
  // always samples exactly): the DEFAULT is now the approximate native
  // path, so 'equal'/'mixed' per-label counts carry Bernoulli/Poisson
  // variance. Callers that require exact per-label counts must opt in
  // with setExactCounts(true) — the 6-7x pipeline speedup of the codegen
  // path is the documented reason for the new default (see README
  // "Behavior notes").
  final val exactCounts = new BooleanParam(this, "exactCounts",
    "use RDD sampleByKeyExact for exact per-label sample sizes " +
      "(default false: approximate codegen-preserving sampling)")
  setDefault(exactCounts -> false)
  def setExactCounts(v: Boolean): this.type = set(exactCounts, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    transformSchema(ds.schema)
    val df = ds.toDF()
    val numPartitions = df.queryExecution.toRdd.getNumPartitions
    val counts = df.groupBy(getLabelCol).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    if ($(exactCounts)) transformExact(df, numPartitions, counts)
    else transformNative(df, numPartitions, counts)
  }

  /** Codegen-preserving default: per-label fraction as a literal
    * when-chain (label cardinality is small by definition of stratified),
    * Bernoulli keep for fractions ≤ 1, floor+Bernoulli-remainder
    * replication (Poisson-style) for fractions > 1, then one
    * `repartition(n, randKey)` Exchange to spread every label across all
    * partitions. No RDD conversion anywhere in the plan.
    */
  private def transformNative(df: DataFrame, numPartitions: Int,
                              counts: Map[Any, Long]): DataFrame = {
    val (_, fractions) = modeFractions(counts, numPartitions)
    // 'original' keeps everything; 'equal'/'mixed' are both
    // with-replacement, and floor+Bernoulli-remainder handles fractions
    // below 1 too (floor 0, keep-with-probability via the __copies > 0
    // filter), so one replicate path covers every sampling mode
    val sampled =
      if ($(mode) == "original") df
      else {
        val fracCol = fractions.foldLeft(lit(1.0)) { case (acc, (k, f)) =>
          when(col(getLabelCol) === lit(k), lit(f)).otherwise(acc)
        }
        val copies = (floor(fracCol) +
          when(rand($(seed)) < fracCol - floor(fracCol), 1.0)
            .otherwise(0.0)).cast("int")
        df.withColumn("__copies", copies)
          .where(col("__copies") > 0)
          .withColumn("__dup", explode(sequence(lit(1), col("__copies"))))
          .drop("__copies", "__dup")
      }
    sampled
      .repartition(numPartitions,
        (rand($(seed) + 1) * numPartitions).cast("int"))
  }

  private def modeFractions(counts: Map[Any, Long],
                            numPartitions: Int): (Boolean, Map[Any, Double]) = {
    def equalFractions: Map[Any, Double] = {
      val target = math.max(counts.values.max, numPartitions.toLong).toDouble
      counts.map { case (k, c) => k -> target / c }
    }
    $(mode) match {
      case "original" => (false, counts.map { case (k, _) => k -> 1.0 })
      case "equal" => (true, equalFractions)
      case "mixed" =>
        val eq = equalFractions
        val mean = eq.values.sum / eq.size
        (true, eq.map { case (k, f) => k -> f / mean })
    }
  }

  private def transformExact(df: DataFrame, numPartitions: Int,
                             counts: Map[Any, Long]): DataFrame = {
    val spark = df.sparkSession
    val (withReplacement, fractions) = modeFractions(counts, numPartitions)
    // resolve ONCE driver-side: getAs is an exact-name lookup per ROW,
    // and a case-differing labelCol that requireCols (analyzer
    // semantics) accepted must not fail inside every executor task
    // (review find)
    val labelName = SchemaChecks.resolve(df.schema, getLabelCol)
    val keyed = df.rdd.map(r => r.getAs[Any](labelName) -> r)
    val sampled = keyed.sampleByKeyExact(withReplacement, fractions, $(seed))
    // spread each label across all partitions: per-label running index
    val spread = sampled
      .mapPartitions { it =>
        val perLabel = scala.collection.mutable.Map.empty[Any, Int]
        it.map { case (k, r) =>
          val i = perLabel.getOrElse(k, 0); perLabel(k) = i + 1
          ((k.hashCode * 31 + i) % numPartitions) -> r
        }
      }
      .partitionBy(new org.apache.spark.HashPartitioner(numPartitions))
      .map(_._2)
    spark.createDataFrame(spread, df.schema)
  }
  override def transformSchema(schema: StructType): StructType = {
    SchemaChecks.requireCols(schema, "labelCol" -> getLabelCol)
    schema
  }
  override def copy(extra: ParamMap): StratifiedRepartition = defaultCopy(extra)
}
object StratifiedRepartition extends graft.core.GraftReadable[StratifiedRepartition]


/** Per-JVM funnel state for [[PartitionConsolidator]]. Worker-count
  * protocol (ref: core/.../stages/PartitionConsolidator.scala:52-138):
  * the first partition to register on a JVM (workers == 0) becomes the
  * *chosen* one and lazily streams — buffered rows from other partitions
  * first, then its own input iterator — staying alive while any other
  * worker is still feeding the buffer, plus one grace period for workers
  * that have not registered yet. Non-chosen partitions dump their rows
  * into the buffer and finish. A partition that registers *after* the
  * chosen one exited sees workers == 0 again and becomes a new chosen
  * worker, so late-scheduled partitions can never lose rows — this is
  * what makes the protocol safe when partitions outnumber task slots or
  * executors run many waves.
  */
private[stages] class ConsolidatorState {
  val buffer = new LinkedBlockingQueue[Row]()
  private var workers = 0
  def register(): Boolean = synchronized { val chosen = workers == 0; workers += 1; chosen }
  def deregister(): Unit = synchronized { workers -= 1 }
  def activeWorkers: Int = synchronized { workers }
}

/** Funnel all rows on a JVM through a single worker partition — the
  * reference uses this to share one rate-limited resource (e.g. an HTTP
  * connection) per machine (ref: core/.../stages/PartitionConsolidator
  * .scala:22-138). Consolidation is per-JVM by design: on a real cluster
  * each executor JVM funnels its own partitions through one task; rows
  * never cross JVMs (no shuffle).
  */
class PartitionConsolidator(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PartitionConsolidator"))

  final val gracePeriodMs = new LongParam(this, "gracePeriodMs",
    "how long the chosen partition lingers for not-yet-registered workers")
  setDefault(gracePeriodMs -> 1000L)
  def setGracePeriodMs(v: Long): this.type = set(gracePeriodMs, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val schema = df.schema
    val uidLocal = uid
    val grace = $(gracePeriodMs)
    val consolidated = df.rdd.mapPartitions { it =>
      // state scoped per ACTION: key by stage id + attempt so re-executions
      // of the stage get fresh per-JVM state
      val tc = org.apache.spark.TaskContext.get()
      val state = SharedSingleton(
        s"consolidator-$uidLocal-${tc.stageId()}-${tc.stageAttemptNumber()}") {
        new ConsolidatorState
      }.get
      val chosen = state.register()
      if (chosen) {
        new Iterator[Option[Row]] {
          private var done = false
          private def available: Boolean =
            !state.buffer.isEmpty || it.hasNext || state.activeWorkers > 1
          def hasNext: Boolean = {
            if (done) false
            else if (available) true
            else { // linger one grace period for unregistered late workers
              var left = grace
              while (left > 0 && !available) { Thread.sleep(10); left -= 10 }
              if (available) true
              else { state.deregister(); done = true; false }
            }
          }
          def next(): Option[Row] = {
            val buffered = state.buffer.poll()
            if (buffered != null) Some(buffered)
            else if (it.hasNext) Some(it.next())
            else // workers still feeding but nothing buffered yet: short block
              Option(state.buffer.poll(5, java.util.concurrent.TimeUnit.MILLISECONDS))
          }
        }.flatten
      } else {
        it.foreach(state.buffer.add)
        state.deregister()
        Iterator.empty
      }
    }
    df.sparkSession.createDataFrame(consolidated, schema)
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): PartitionConsolidator = defaultCopy(extra)
}
object PartitionConsolidator extends graft.core.GraftReadable[PartitionConsolidator]

