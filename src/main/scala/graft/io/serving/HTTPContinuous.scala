package graft.io.serving

import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{ContinuousPartitionReader, ContinuousPartitionReaderFactory, ContinuousStream, MicroBatchStream, PartitionOffset, Offset => ConnectorOffset}
import org.apache.spark.sql.connector.write.{DataWriter, LogicalWriteInfo, PhysicalWriteInfo, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util

/** Spark Serving, CONTINUOUS mode (ref:
  * .../continuous/HTTPSourceV2.scala:205-330,475-620 + docs/mmlspark-serving
  * .md:10-11,93 — the ~1 ms path): DSv2 continuous source whose
  * long-lived partition readers block directly on the executor-JVM
  * request queue, paired with a DSv2 streaming write that answers each
  * reply from the task, so a request is HTTP-in → row → transform → reply
  * without ever waiting for a micro-batch boundary.
  *
  * Shares [[DistributedServingState]] with the distributed micro-batch
  * mode: same per-JVM listener, same (machine, requestId) correlation.
  * `queue.poll()` is atomic, so multiple readers on one JVM split the
  * request stream without duplication.
  */
object HTTPContinuous {
  val schema: StructType = DistributedHTTPSourceV1.schema

  case class ReaderOffset(partitionId: Int, count: Long) extends PartitionOffset
  case class EpochOffset(counts: Map[Int, Long]) extends ConnectorOffset {
    override def json(): String = counts.toSeq.sorted
      .map { case (p, c) => s""""$p":$c""" }.mkString("{", ",", "}")
  }
  object EpochOffset {
    private val Entry = """"(\d+)":(\d+)""".r
    def fromJson(s: String): EpochOffset =
      EpochOffset(Entry.findAllMatchIn(s)
        .map(m => m.group(1).toInt -> m.group(2).toLong).toMap)
  }

  case class ServingPartition(partitionId: Int, name: String, host: String,
                              path: String) extends InputPartition
}

class HTTPContinuousProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-continuous"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HTTPContinuous.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HTTPContinuousTable(
      Option(properties.get("name")).getOrElse("default"),
      Option(properties.get("host")).getOrElse("localhost"),
      Option(properties.get("path")).getOrElse("/"),
      Option(properties.get("numpartitions")).map(_.toInt).getOrElse(2))
}

/** Serves BOTH streaming modes through one DSv2 table (ref:
  * HTTPSourceV2.scala:54-79, whose HTTPSourceProviderV2 likewise exposes
  * micro-batch and continuous from the same provider): the trigger picks
  * the path — default/AvailableNow → [[HTTPMicroBatchStream]],
  * Trigger.Continuous → [[HTTPContinuousStream]]. Both share
  * [[DistributedServingState]], so the per-JVM listener, request queue
  * and (machine, requestId) reply correlation are identical across modes.
  */
class HTTPContinuousTable(name: String, host: String, path: String,
                          numPartitions: Int) extends Table with SupportsRead {
  override def name(): String = s"graft-http-continuous-$name"
  override def schema(): StructType = HTTPContinuous.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.CONTINUOUS_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = HTTPContinuous.schema
        override def toContinuousStream(checkpointLocation: String): ContinuousStream =
          new HTTPContinuousStream(name, host, path, numPartitions)
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new HTTPMicroBatchStream(name, host, path)
      }
    }
}

/** DSv2 MICRO-BATCH mode over the same per-JVM serving state the
  * continuous reader uses — retires the DSv1 `Source`/`Sink`
  * deprecation-risk path flagged by SURVEY §7. Mechanics mirror
  * [[DistributedHTTPSourceV1]]: offsets are a per-machine request-count
  * map polled by a lightweight job over a one-partition-per-slot setup
  * RDD; each batch's rows are drained locally by whichever task claims
  * the batch on its JVM (exactly one winner per JVM per batch), and stay
  * in the `drained` map until commit so recomputation replays
  * identically. Request payloads never pass through the driver.
  */
class HTTPMicroBatchStream(name: String, host: String, path: String)
    extends MicroBatchStream {
  import HTTPMicroBatch._

  private val sc = org.apache.spark.sql.SparkSession.active.sparkContext
  @transient private lazy val setupRdd =
    sc.parallelize(0 until sc.defaultParallelism, sc.defaultParallelism)

  // start the per-JVM listeners everywhere before the first offset poll
  locally {
    val (n, h, p) = (name, host, path)
    setupRdd.mapPartitions { _ =>
      DistributedServingState.ensure(n, h, p); Iterator.empty[Int]
    }.count()
  }

  override def latestOffset(): ConnectorOffset = {
    val n = name
    val counts = setupRdd.mapPartitions { _ =>
      DistributedServingState.get(n)
        .map(s => Iterator((s.machineId, s.counter.get())))
        .getOrElse(Iterator.empty)
    }.collect()
      // two setup partitions on one JVM can observe different counter
      // values while requests arrive; keep the max so the reported
      // offset never regresses across polls
      .groupBy(_._1).map { case (m, xs) => m -> xs.map(_._2).max }
    MachineOffset(counts)
  }

  override def initialOffset(): ConnectorOffset = MachineOffset(Map.empty)
  override def deserializeOffset(json: String): ConnectorOffset =
    MachineOffset.fromJson(json)

  override def planInputPartitions(start: ConnectorOffset,
                                   end: ConnectorOffset): Array[InputPartition] = {
    val lo = MachineOffset.fromJson(start.json()).counts
    val hi = MachineOffset.fromJson(end.json()).counts
    Array.tabulate(sc.defaultParallelism)(i =>
      BatchServingPartition(i, name, host, path, lo, hi, end.json()))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new HTTPMicroBatchReader(partition.asInstanceOf[BatchServingPartition])
    }

  override def commit(end: ConnectorOffset): Unit = {
    val n = name
    val hi = MachineOffset.fromJson(end.json()).counts
    val hiB = sc.broadcast(hi)
    setupRdd.mapPartitions { _ =>
      DistributedServingState.get(n).foreach { s =>
        val to = hiB.value.getOrElse(s.machineId, 0L)
        s.drained.keys.filter(_ < to).foreach(s.drained.remove)
        s.batchClaims.clear()
      }
      Iterator.empty[Int]
    }.count()
    ()
  }

  override def stop(): Unit = {
    val n = name
    setupRdd.mapPartitions { _ =>
      DistributedServingState.stop(n); Iterator.empty[Int]
    }.count()
    ()
  }
}

object HTTPMicroBatch {
  case class BatchServingPartition(partitionId: Int, name: String,
                                   host: String, path: String,
                                   lo: Map[String, Long], hi: Map[String, Long],
                                   endJson: String) extends InputPartition
}

/** Emits the local JVM's drained rows in [lo, hi) — only if this task won
  * the per-JVM batch claim (same single-emitter trick as the DSv1 path:
  * deterministic on recompute because the winner re-runs with its id). */
class HTTPMicroBatchReader(p: HTTPMicroBatch.BatchServingPartition)
    extends PartitionReader[InternalRow] {

  private val rows: Iterator[InternalRow] = {
    val s = DistributedServingState.ensure(p.name, p.host, p.path)
    s.synchronized { s.drainQueue() }
    val winner = s.batchClaims.putIfAbsent(p.endJson, p.partitionId)
      .getOrElse(p.partitionId)
    if (winner != p.partitionId) Iterator.empty
    else {
      val from = p.lo.getOrElse(s.machineId, 0L)
      val to = p.hi.getOrElse(s.machineId, 0L)
      s.drained.keys.filter(id => id >= from && id < to).toSeq.sorted
        .iterator.flatMap { id =>
          s.drained.get(id).map { case (m, pth, b) =>
            InternalRow(
              InternalRow(UTF8String.fromString(s.machineId), id),
              UTF8String.fromString(m), UTF8String.fromString(pth), b)
          }
        }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}

class HTTPContinuousStream(name: String, host: String, path: String,
                           numPartitions: Int) extends ContinuousStream {
  import HTTPContinuous._

  override def planInputPartitions(start: ConnectorOffset): Array[InputPartition] =
    Array.tabulate(numPartitions)(i => ServingPartition(i, name, host, path))

  override def createContinuousReaderFactory(): ContinuousPartitionReaderFactory =
    new ContinuousPartitionReaderFactory {
      override def createReader(partition: InputPartition): ContinuousPartitionReader[InternalRow] = {
        val p = partition.asInstanceOf[ServingPartition]
        new HTTPContinuousReader(p.partitionId, p.name, p.host, p.path)
      }
    }

  override def mergeOffsets(offsets: Array[PartitionOffset]): ConnectorOffset =
    EpochOffset(offsets.map { case ReaderOffset(p, c) => p -> c }.toMap)

  override def initialOffset(): ConnectorOffset = EpochOffset(Map.empty)
  override def deserializeOffset(json: String): ConnectorOffset =
    EpochOffset.fromJson(json)
  override def commit(end: ConnectorOffset): Unit = ()
  override def stop(): Unit = ()
}

class HTTPContinuousReader(partitionId: Int, name: String, host: String,
                           path: String)
    extends ContinuousPartitionReader[InternalRow] {
  import HTTPContinuous._

  private val server = DistributedServingState.ensure(name, host, path)
  private var emitted = 0L
  private var current: InternalRow = _
  @volatile private var closed = false

  override def next(): Boolean = {
    // block until a request arrives (the engine interleaves epoch markers)
    var e = server.queue.poll()
    while (e == null && !closed) {
      Thread.sleep(1)
      e = server.queue.poll()
    }
    if (closed) false
    else {
      val (id, ex) = e
      val body = ex.getRequestBody.readAllBytes()
      server.pending.put(id, ex)
      current = InternalRow(
        InternalRow(UTF8String.fromString(server.machineId), id),
        UTF8String.fromString(ex.getRequestMethod),
        UTF8String.fromString(ex.getRequestURI.toString), body)
      emitted += 1
      true
    }
  }
  override def get(): InternalRow = current
  override def getOffset: PartitionOffset = ReaderOffset(partitionId, emitted)
  override def close(): Unit = { closed = true }
}

/** Continuous reply sink: DSv2 streaming write whose per-task DataWriter
  * answers each reply row's exchange on the owning JVM immediately. */
class HTTPContinuousReplyProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-http-continuous-reply"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType() // write-only; schema supplied by the query
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new HTTPContinuousReplyTable(
      Option(properties.get("name")).getOrElse("default"), schema)
}

class HTTPContinuousReplyTable(name: String, writeSchema: StructType)
    extends Table with SupportsWrite {
  override def name(): String = s"graft-http-continuous-reply-$name"
  override def schema(): StructType = writeSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.STREAMING_WRITE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder {
      private val schema = info.schema()
      override def build(): org.apache.spark.sql.connector.write.Write =
        new org.apache.spark.sql.connector.write.Write {
          override def toStreaming: StreamingWrite =
            new ReplyStreamingWrite(name, schema)
        }
    }
}

// the continuous engine serializes the StreamingWrite into its long-lived
// write tasks, so everything on this path must be Serializable
class ReplyStreamingWrite(name: String, schema: StructType)
    extends StreamingWrite with Serializable {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo): StreamingDataWriterFactory =
    new ReplyWriterFactory(name, schema)
  override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
}

class ReplyWriterFactory(name: String, schema: StructType)
    extends StreamingDataWriterFactory with Serializable {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new ReplyDataWriter(name, schema)
}

class ReplyDataWriter(name: String, schema: StructType)
    extends DataWriter[InternalRow] {
  private val idIdx = schema.fieldIndex("id")
  private val replyIdx = schema.fieldIndex("reply")

  override def write(r: InternalRow): Unit =
    DistributedServingState.get(name).foreach { s =>
      val id = r.getStruct(idIdx, 2)
      if (id.getUTF8String(0).toString == s.machineId) {
        s.pending.remove(id.getLong(1)).foreach { ex =>
          val reply = r.getStruct(replyIdx, 2)
          val status = reply.getInt(0)
          val entity = if (reply.isNullAt(1)) Array.emptyByteArray
            else reply.getBinary(1)
          ex.sendResponseHeaders(status, if (entity.isEmpty) -1 else entity.length)
          if (entity.nonEmpty) ex.getResponseBody.write(entity)
          ex.close()
        }
      }
    }
  override def commit(): WriterCommitMessage = new WriterCommitMessage {}
  override def abort(): Unit = ()
  override def close(): Unit = ()
}
