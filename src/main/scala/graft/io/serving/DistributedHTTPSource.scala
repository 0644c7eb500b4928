package graft.io.serving

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import org.apache.spark.sql.{DataFrame, SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.streaming.{Offset, Sink, Source}
import org.apache.spark.sql.sources.{DataSourceRegister, StreamSinkProvider, StreamSourceProvider}
import org.apache.spark.sql.streaming.OutputMode
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.net.InetSocketAddress
import scala.collection.concurrent.TrieMap

/** Spark Serving, DISTRIBUTED mode (ref:
  * org/apache/spark/sql/execution/streaming/DistributedHTTPSource
  * .scala:205-313 + JVMSharedServer:90-203): one HTTP listener per
  * EXECUTOR JVM; requests queue locally, batch rows are drained by tasks
  * running on their own JVM, and replies are answered by whichever task
  * lands on the owning JVM — request payloads never pass through the
  * driver, so ingestion scales with the executor count ("no single-node
  * bottleneck", docs/mmlspark-serving.md:5-9).
  *
  * Offsets are a per-machine count map; getOffset/getBatch run
  * lightweight polling jobs over a one-partition-per-slot setup RDD (the
  * reference drives server lifecycle the same way). Queries must keep
  * rows on their origin JVM (map-only, no shuffle) for local replies —
  * the reference documents the same constraint for its V1 distributed
  * sink.
  */
object DistributedServingState {
  class JvmServer(val name: String, host: String, path: String) {
    val machineId: String = java.util.UUID.randomUUID().toString
    val queue = new java.util.concurrent.ConcurrentLinkedQueue[(Long, HttpExchange)]()
    val drained = TrieMap.empty[Long, (String, String, Array[Byte])]
    val pending = TrieMap.empty[Long, HttpExchange]
    val counter = new java.util.concurrent.atomic.AtomicLong(0L)
    // batch-endOffset -> winning partition id: exactly ONE of the JVM's
    // concurrent setup tasks emits a given batch (others see a lost claim);
    // deterministic on recompute because the winner re-runs with its id
    val batchClaims = TrieMap.empty[String, Int]
    val server: HttpServer = {
      graft.core.ServerTuning.ensure()
      HttpServer.create(new InetSocketAddress(host, 0), 0)
    }
    server.createContext(path, new HttpHandler {
      def handle(ex: HttpExchange): Unit =
        queue.add((counter.getAndIncrement(), ex))
    })
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      r => { val t = new Thread(r); t.setDaemon(true); t }))
    server.start()
    def port: Int = server.getAddress.getPort

    /** Move queued exchanges into the drained map (payload read once). */
    def drainQueue(): Unit = {
      var e = queue.poll()
      while (e != null) {
        val (id, ex) = e
        drained.put(id,
          (ex.getRequestMethod, ex.getRequestURI.toString,
            ex.getRequestBody.readAllBytes()))
        pending.put(id, ex)
        e = queue.poll()
      }
    }
  }

  private val servers = TrieMap.empty[String, JvmServer]
  def ensure(name: String, host: String, path: String): JvmServer =
    servers.getOrElseUpdate(name, new JvmServer(name, host, path))
  def get(name: String): Option[JvmServer] = servers.get(name)
  def stop(name: String): Unit =
    servers.remove(name).foreach(_.server.stop(0))
}

/** Offset = machineId -> request count (ref HTTPOffset partitionToValue,
  * HTTPSourceV2.scala:95-112). */
case class MachineOffset(counts: Map[String, Long]) extends Offset {
  override def json(): String =
    counts.toSeq.sortBy(_._1)
      .map { case (m, c) => s""""$m":$c""" }.mkString("{", ",", "}")
}

object MachineOffset {
  private val Entry = """"([0-9a-f-]+)":(\d+)""".r
  def fromJson(s: String): MachineOffset =
    MachineOffset(Entry.findAllMatchIn(s)
      .map(m => m.group(1) -> m.group(2).toLong).toMap)
  def of(o: Offset): MachineOffset = o match {
    case m: MachineOffset => m
    case other => fromJson(other.json())
  }
}

object DistributedHTTPSourceV1 {
  val schema: StructType = StructType(Seq(
    StructField("id", StructType(Seq(
      StructField("machine", StringType, nullable = false),
      StructField("requestId", LongType, nullable = false))), nullable = false),
    StructField("method", StringType),
    StructField("path", StringType),
    StructField("entity", BinaryType)))
}

class DistributedHTTPSourceV1(spark: SparkSession, name: String, host: String,
                              path: String) extends Source {
  private val sc = spark.sparkContext
  // one partition per task slot: every executor JVM runs >=1 setup task
  private val setupRdd =
    sc.parallelize(0 until sc.defaultParallelism, sc.defaultParallelism)
  // start servers everywhere; remember the fleet for monitoring
  val serverAddresses: Array[(String, String, Int)] = {
    val n = name; val h = host; val p = path
    setupRdd.mapPartitions { _ =>
      val s = DistributedServingState.ensure(n, h, p)
      Iterator((s.machineId, java.net.InetAddress.getLocalHost.getHostName, s.port))
    }.collect().distinct
  }

  override def schema: StructType = DistributedHTTPSourceV1.schema

  override def getOffset: Option[Offset] = {
    val n = name
    val counts = setupRdd.mapPartitions { _ =>
      DistributedServingState.get(n)
        .map(s => Iterator((s.machineId, s.counter.get()))).getOrElse(Iterator.empty)
    }.collect().distinct.toMap
    if (counts.values.sum == 0) None else Some(MachineOffset(counts))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    val n = name
    val lo = start.map(MachineOffset.of(_).counts).getOrElse(Map.empty)
    val hi = MachineOffset.of(end).counts
    val endJson = MachineOffset.of(end).json()
    val loB = sc.broadcast(lo); val hiB = sc.broadcast(hi)
    val rdd = setupRdd.mapPartitions { _ =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      DistributedServingState.get(n) match {
        case Some(s) =>
          s.synchronized { s.drainQueue() }
          // one emitter per JVM per batch; rows stay in `drained` until
          // commit so batch recomputation replays identically
          val winner = s.batchClaims.putIfAbsent(endJson, pid).getOrElse(pid)
          if (winner != pid) Iterator.empty
          else {
            val from = loB.value.getOrElse(s.machineId, 0L)
            val to = hiB.value.getOrElse(s.machineId, 0L)
            val ids = s.drained.keys.filter(id => id >= from && id < to)
              .toSeq.sorted
            ids.iterator.flatMap { id =>
              s.drained.get(id).map { case (m, p, b) =>
                InternalRow(
                  InternalRow(UTF8String.fromString(s.machineId), id),
                  UTF8String.fromString(m), UTF8String.fromString(p), b)
              }
            }
          }
        case None => Iterator.empty
      }
    }
    org.apache.spark.sql.graftshims.StreamingBridge
      .internalCreateDataFrame(spark, rdd, schema)
  }

  override def commit(end: Offset): Unit = {
    val n = name
    val hi = MachineOffset.of(end).counts
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

class DistributedHTTPSourceProvider extends StreamSourceProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-http-distributed"
  override def sourceSchema(ctx: SQLContext, schema: Option[StructType],
                            providerName: String,
                            parameters: Map[String, String]): (String, StructType) =
    (parameters.getOrElse("name", "default"), DistributedHTTPSourceV1.schema)
  override def createSource(ctx: SQLContext, metadataPath: String,
                            schema: Option[StructType], providerName: String,
                            parameters: Map[String, String]): Source =
    new DistributedHTTPSourceV1(ctx.sparkSession,
      parameters.getOrElse("name", "default"),
      parameters.getOrElse("host", "localhost"),
      parameters.getOrElse("path", "/"))
}

/** Distributed reply sink: a job answers each reply row on the JVM that
  * owns its exchange (ref: DistributedHTTPSink.addBatch:386-407). Rows
  * that migrated JVMs (shuffling query) are skipped on foreign JVMs —
  * map-only queries keep them home, same contract as the reference. */
class DistributedHTTPSinkV1(name: String) extends Sink {
  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val n = name
    val schema = data.schema
    val idIdx = schema.fieldIndex("id")
    val replyIdx = schema.fieldIndex("reply")
    data.queryExecution.toRdd.foreachPartition {
      (it: Iterator[InternalRow]) =>
        DistributedServingState.get(n).foreach { s =>
          it.foreach { r =>
            val id = r.getStruct(idIdx, 2)
            if (id.getUTF8String(0).toString == s.machineId) {
              s.pending.remove(id.getLong(1)).foreach { ex =>
                val reply = r.getStruct(replyIdx, 2)
                val status = reply.getInt(0)
                val entity = if (reply.isNullAt(1)) Array.emptyByteArray
                  else reply.getBinary(1)
                ex.sendResponseHeaders(status,
                  if (entity.isEmpty) -1 else entity.length)
                if (entity.nonEmpty) ex.getResponseBody.write(entity)
                ex.close()
              }
            }
          }
        }
    }
  }
}

class DistributedHTTPSinkProvider extends StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft-http-distributed-reply"
  override def createSink(ctx: SQLContext, parameters: Map[String, String],
                          partitionColumns: Seq[String],
                          outputMode: OutputMode): Sink =
    new DistributedHTTPSinkV1(parameters.getOrElse("name", "default"))
}
