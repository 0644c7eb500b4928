package graft.stages

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.{ConcurrentLinkedQueue, atomic}

/** Per-label exact resampling + spread so every partition sees every label
  * (ref: core/.../stages/StratifiedRepartition.scala:48-77; modes
  * equal/original/mixed). Implemented with `sampleByKeyExact` on the keyed
  * RDD followed by a round-robin-within-label redistribution (hash of a
  * per-label row_number modulo target partitions), which is the
  * RangePartitioner trick the reference uses expressed as one shuffle.
  */
class StratifiedRepartition(override val uid: String) extends Transformer
    with HasLabelCol {
  def this() = this(Identifiable.randomUID("StratifiedRepartition"))

  final val mode = new Param[String](this, "mode", "equal | original | mixed",
    ParamValidators.inArray(Array("equal", "original", "mixed")))
  setDefault(mode -> "original")
  def setMode(v: String): this.type = set(mode, v)
  final val seed = new LongParam(this, "seed", "sampling seed")
  setDefault(seed -> 1234L)
  def setSeed(v: Long): this.type = set(seed, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val spark = df.sparkSession
    val numPartitions = df.rdd.getNumPartitions
    val counts = df.groupBy(getLabelCol).count().collect()
      .map(r => r.get(0) -> r.getLong(1)).toMap
    val total = counts.values.sum.toDouble
    val nLabels = counts.size
    val fractions: Map[Any, Double] = $(mode) match {
      case "original" => counts.map { case (k, _) => k -> 1.0 }
      case "equal" =>
        val target = total / nLabels
        counts.map { case (k, c) => k -> math.min(1.0, target / c) }
      case "mixed" =>
        // reference's heuristic: cap classes above 3x the equal share
        val target = total / nLabels
        counts.map { case (k, c) =>
          k -> math.min(1.0, math.max(target * 3, c * 0.5) / c) }
    }
    val keyed = df.rdd.map(r => r.getAs[Any](getLabelCol) -> r)
    val sampled = keyed.sampleByKeyExact(withReplacement = false,
      fractions = fractions, seed = $(seed))
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
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): StratifiedRepartition = defaultCopy(extra)
}

/** Funnel all rows on a JVM through a single worker partition — the
  * reference uses this to share one rate-limited resource (e.g. an HTTP
  * connection) per machine (ref: core/.../stages/PartitionConsolidator
  * .scala:22-138). Rows from non-chosen partitions are queued into a
  * per-JVM singleton; the first partition to claim the JVM drains the queue
  * and emits everything.
  */
class PartitionConsolidator(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("PartitionConsolidator"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val schema = df.schema
    val uidLocal = uid
    val nParts = df.rdd.getNumPartitions
    val consolidated = df.rdd.mapPartitions { it =>
      // state must be scoped per ACTION (each action re-runs the stage):
      // key by stage id + attempt so re-executions get fresh state
      val tc = org.apache.spark.TaskContext.get()
      val state = SharedSingleton(
        s"consolidator-$uidLocal-${tc.stageId()}-${tc.stageAttemptNumber()}") {
        (new ConcurrentLinkedQueue[Row](), new atomic.AtomicBoolean(false),
          new atomic.AtomicInteger(0))
      }
      val (queue, chosen, done) = state.get
      it.foreach(queue.add)
      val amChosen = chosen.compareAndSet(false, true)
      val finished = done.incrementAndGet()
      if (amChosen) {
        // drain until every partition has contributed; null = retry sentinel
        new Iterator[Row] {
          def hasNext: Boolean = !queue.isEmpty || done.get() < nParts
          def next(): Row = {
            var r = queue.poll()
            while (r == null && !(queue.isEmpty && done.get() >= nParts)) {
              Thread.sleep(1); r = queue.poll()
            }
            r
          }
        }.filter(_ != null)
      } else Iterator.empty
    }
    df.sparkSession.createDataFrame(consolidated, schema)
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): PartitionConsolidator = defaultCopy(extra)
}
