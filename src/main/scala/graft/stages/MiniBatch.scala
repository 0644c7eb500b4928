package graft.stages

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.catalyst.encoders.{ExpressionEncoder, RowEncoder}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.util.concurrent.LinkedBlockingQueue

/** Minibatching operators (ref: core/.../stages/MiniBatchTransformer.scala,
  * Batchers.scala). Each column of a batch becomes an ArrayType column;
  * `FlattenBatch` is the inverse. Batching is partition-local — zero
  * shuffle — so it composes with upstream partitioning untouched.
  */
abstract class MiniBatchBase(override val uid: String) extends Transformer {

  protected def batchIterator(it: Iterator[Row]): Iterator[Seq[Row]]

  protected def transposeSchema(schema: StructType): StructType =
    StructType(schema.map(f => f.copy(dataType = ArrayType(f.dataType, true))))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val inSchema = df.schema
    val outSchema = transposeSchema(inSchema)
    val enc = ExpressionEncoder(RowEncoder.encoderFor(outSchema))
    val n = inSchema.length
    df.mapPartitions { it =>
      batchIterator(it).map { batch =>
        Row.fromSeq((0 until n).map(i => batch.map(_.get(i))))
      }
    }(enc)
  }
  override def transformSchema(schema: StructType): StructType =
    transposeSchema(schema)
}

/** Fixed-size batches (ref: MiniBatchTransformer.scala:130-177), optional
  * double-buffered prefetch on a dedicated producer thread
  * (ref: Batchers.scala:65-129).
  */
class FixedMiniBatchTransformer(override val uid: String)
    extends MiniBatchBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("FixedMiniBatch"))

  final val batchSize = new IntParam(this, "batchSize", "rows per batch",
    ParamValidators.gt(0))
  setDefault(batchSize -> 10)
  def setBatchSize(v: Int): this.type = set(batchSize, v)
  final val buffered = new BooleanParam(this, "buffered",
    "prefetch batches on a background thread")
  setDefault(buffered -> false)
  def setBuffered(v: Boolean): this.type = set(buffered, v)

  override protected def batchIterator(it: Iterator[Row]): Iterator[Seq[Row]] = {
    val base = it.grouped($(batchSize))
    if (!$(buffered)) base
    else new Iterator[Seq[Row]] {
      private val queue = new LinkedBlockingQueue[Option[Seq[Row]]](2)
      private val t = new Thread(() => {
        base.foreach(b => queue.put(Some(b))); queue.put(None)
      })
      t.setDaemon(true); t.start()
      private var nextVal: Option[Seq[Row]] = queue.take()
      def hasNext: Boolean = nextVal.isDefined
      def next(): Seq[Row] = {
        val v = nextVal.get; nextVal = queue.take(); v
      }
    }
  }
  override def copy(extra: ParamMap): FixedMiniBatchTransformer = defaultCopy(extra)
}
object FixedMiniBatchTransformer extends graft.core.GraftReadable[FixedMiniBatchTransformer]


/** Latency-adaptive batches: each batch is whatever the producer thread has
  * buffered when the consumer asks (ref: MiniBatchTransformer.scala:45-67,
  * Batchers.scala:12-63). Batch boundaries are nondeterministic; content is
  * exactly the input rows.
  */
class DynamicMiniBatchTransformer(override val uid: String)
    extends MiniBatchBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("DynamicMiniBatch"))

  final val maxBatchSize = new IntParam(this, "maxBatchSize", "cap per batch")
  setDefault(maxBatchSize -> Int.MaxValue)
  def setMaxBatchSize(v: Int): this.type = set(maxBatchSize, v)

  override protected def batchIterator(it: Iterator[Row]): Iterator[Seq[Row]] =
    new Iterator[Seq[Row]] {
      private val queue = new LinkedBlockingQueue[Option[Row]]()
      private val t = new Thread(() => {
        it.foreach(r => queue.put(Some(r))); queue.put(None)
      })
      t.setDaemon(true); t.start()
      private var exhausted = false
      private var stash: Option[Row] = None
      def hasNext: Boolean = !exhausted && (stash.isDefined || {
        // block for at least one element or the end marker
        queue.take() match {
          case None => exhausted = true; false
          case some => stash = some; true
        }
      })
      def next(): Seq[Row] = {
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        stash.foreach(buf += _); stash = None
        var done = false
        while (!done && buf.size < $(maxBatchSize)) {
          val head = queue.poll()
          if (head == null) done = true
          else head match {
            case Some(r) => buf += r
            case None => exhausted = true; done = true
          }
        }
        buf.toSeq
      }
    }
  override def copy(extra: ParamMap): DynamicMiniBatchTransformer = defaultCopy(extra)
}
object DynamicMiniBatchTransformer extends graft.core.GraftReadable[DynamicMiniBatchTransformer]


/** Wall-clock-window batches (ref: MiniBatchTransformer.scala:69-100,
  * Batchers.scala:131-152).
  */
class TimeIntervalMiniBatchTransformer(override val uid: String)
    extends MiniBatchBase(uid) with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TimeIntervalMiniBatch"))

  final val millisToWait = new IntParam(this, "millisToWait",
    "batch window in ms", ParamValidators.gt(0))
  setDefault(millisToWait -> 1000)
  def setMillisToWait(v: Int): this.type = set(millisToWait, v)
  final val maxBatchSize = new IntParam(this, "maxBatchSize", "cap per batch")
  setDefault(maxBatchSize -> Int.MaxValue)

  override protected def batchIterator(it: Iterator[Row]): Iterator[Seq[Row]] =
    new Iterator[Seq[Row]] {
      def hasNext: Boolean = it.hasNext
      def next(): Seq[Row] = {
        val deadline = System.currentTimeMillis() + $(millisToWait)
        val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
        while (it.hasNext && System.currentTimeMillis() < deadline &&
          buf.size < $(maxBatchSize)) buf += it.next()
        buf.toSeq
      }
    }
  override def copy(extra: ParamMap): TimeIntervalMiniBatchTransformer =
    defaultCopy(extra)
}
object TimeIntervalMiniBatchTransformer extends graft.core.GraftReadable[TimeIntervalMiniBatchTransformer]


/** Inverse of minibatching: explode parallel array columns back to rows.
  * Implemented natively as `arrays_zip` + `explode` + field projection —
  * null-tolerant transpose (shorter arrays pad with null), fully codegen'd
  * (ref: MiniBatchTransformer.scala:179-228).
  */
class FlattenBatch(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("FlattenBatch"))

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val arrayCols = df.schema.fields.collect {
      case StructField(name, ArrayType(_, _), _, _) => name
    }
    require(arrayCols.length == df.schema.length,
      "FlattenBatch: all columns must be arrays")
    val zipped = explode(arrays_zip(arrayCols.toIndexedSeq.map(col): _*)).as("__z")
    df.select(zipped)
      .select(arrayCols.toIndexedSeq.map(c => col(s"__z.$c").as(c)): _*)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema.map { f =>
      f.dataType match {
        case ArrayType(et, n) => f.copy(dataType = et, nullable = true)
        case other => throw new IllegalArgumentException(
          s"FlattenBatch: ${f.name} is $other, expected array")
      }
    })
  override def copy(extra: ParamMap): FlattenBatch = defaultCopy(extra)
}
object FlattenBatch extends graft.core.GraftReadable[FlattenBatch]

