package graft.io.binary

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

/** Whole-binary-file reading (ref: core/.../io/binary/BinaryFileFormat
  * .scala:112-186 + BinaryFileReader.scala:1-107), built on Spark's
  * binaryFile source with the reference's option set re-expressed:
  *  - `subsample`: Bernoulli per file, seeded — a pushed-down
  *    `rand(seed) < p` filter, applied before content is read when the
  *    format allows;
  *  - `inspectZip`: zip members exploded to one row each.
  * Output is the reference-compatible struct (path, bytes).
  */
object BinaryFileReader {

  val zipEntryType: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("bytes", BinaryType)))

  def read(spark: SparkSession, path: String,
           recursive: Boolean = true,
           subsample: Double = 1.0,
           seed: Long = 42L,
           inspectZip: Boolean = false): DataFrame = {
    var df = spark.read.format("binaryFile")
      .option("recursiveFileLookup", recursive.toString)
      .load(path)
      .select(col("path"), col("content").as("bytes"))
    if (subsample < 1.0) df = df.filter(rand(seed) < subsample)
    if (inspectZip) {
      val explodeZip = udf(
        new org.apache.spark.sql.api.java.UDF2[String, Array[Byte], Seq[Row]] {
          override def call(path: String, bytes: Array[Byte]): Seq[Row] =
            if (path.toLowerCase.endsWith(".zip")) unzip(bytes)
            else Seq(Row(path, bytes))
        }, ArrayType(zipEntryType))
      df = df.select(explode(explodeZip(col("path"), col("bytes"))).as("e"),
          col("path").as("container"))
        .select(col("e.name").as("path"), col("e.bytes").as("bytes"),
          col("container"))
    }
    df
  }

  /** Zip members as (name, bytes) rows (ref: BinaryFileFormat's
    * ZipIterator). */
  def unzip(bytes: Array[Byte]): Seq[Row] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = scala.collection.mutable.ArrayBuffer.empty[Row]
    var e = zin.getNextEntry
    while (e != null) {
      if (!e.isDirectory) out += Row(e.getName, zin.readAllBytes())
      e = zin.getNextEntry
    }
    out.toSeq
  }
}

/** Binary file WRITE path (ref: BinaryFileFormat writer 217-243): each
  * row's `bytes` lands as one file named by its `path` column (relative
  * names resolved under `outDir`), written executor-side via the Hadoop
  * FS API — no driver collect, works on any DFS.
  */
object BinaryFileWriter {
  def write(df: DataFrame, outDir: String,
            pathCol: String = "path", bytesCol: String = "bytes"): Unit = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val out = outDir
    df.select(col(pathCol), col(bytesCol)).foreachPartition {
      (it: Iterator[Row]) =>
        val base = new org.apache.hadoop.fs.Path(out)
        val fs = base.getFileSystem(conf.value)
        it.foreach { r =>
          val name = new org.apache.hadoop.fs.Path(r.getString(0)).getName
          val stream = fs.create(new org.apache.hadoop.fs.Path(base, name), true)
          try stream.write(r.getAs[Array[Byte]](1)) finally stream.close()
        }
    }
  }
}

/** Multimodal column plumbing: opaque binary payloads + typed metadata +
  * batched "decode / feature-extract" over mapPartitions. The IMAGE
  * modality is REAL: payloads decode through the pure-JVM image stack
  * ([[graft.image.ImageFeatures]]: DecodeImage → bilinear resize →
  * grayscale unroll) into `dim` [0,1] floats. The AUDIO modality is REAL:
  * WAV/PCM payloads decode through the JDK-builtin `javax.sound.sampled`
  * stack ([[AudioFeatures]]: duration/rate/channels/RMS + loudness
  * envelope). The VIDEO modality is REAL for uncompressed YUV4MPEG2
  * payloads ([[VideoFeatures]]: duration/fps/dims/frames + luma
  * envelope); compressed video containers still stub — no codec ships
  * in the JDK (SURVEY build plan §10). `stubbedFallback` controls whether
  * un-decodable payloads and stub modalities warn-and-fake (default,
  * keeps pipelines flowing) or throw. The Spark-side contract — schema,
  * batching, partitioning, null handling — is identical for all
  * modalities.
  */
class MultimodalFeaturizer(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("MultimodalFeaturizer"))
  setDefault(outputCol -> "media_features")

  final val modality = new Param[String](this, "modality",
    "image | audio | video", ParamValidators.inArray(Array("image", "audio", "video")))
  setDefault(modality -> "image")
  def setModality(v: String): this.type = set(modality, v)
  final val dim = new IntParam(this, "dim", "feature dimensionality")
  setDefault(dim -> 16)
  def setDim(v: Int): this.type = set(dim, v)
  final val batchSize = new IntParam(this, "batchSize",
    "rows per decode batch (a real model would infer per batch)")
  setDefault(batchSize -> 32)
  def setBatchSize(v: Int): this.type = set(batchSize, v)
  final val stubbedFallback = new BooleanParam(this, "stubbedFallback",
    "true: hash pseudo-embedding (with a warning) for stub modalities " +
      "and undecodable payloads; false: throw instead")
  setDefault(stubbedFallback -> true)
  def setStubbedFallback(v: Boolean): this.type = set(stubbedFallback, v)

  val metadataType: StructType = StructType(Seq(
    StructField("modality", StringType),
    StructField("size_bytes", LongType),
    StructField("magic", StringType),
    StructField("decoded", BooleanType)))

  /** STUB decode for payloads no in-container codec can read (e.g.
    * compressed video): a deterministic pseudo-embedding from the
    * payload hash, so tests and oracles stay stable. */
  private def stubFeatures(bytes: Array[Byte], d: Int): Array[Float] = {
    var h = 0xCBF29CE484222325L
    var i = 0
    while (i < bytes.length) { h = (h ^ bytes(i)) * 0x100000001B3L; i += 1 }
    val out = new Array[Float](d)
    var j = 0
    var z = h
    while (j < d) {
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      out(j) = ((z >>> 16).toInt.toFloat / Int.MaxValue)
      j += 1
    }
    out
  }

  /** Grayscale target (h, w) with h*w == dim: the largest divisor pair
    * closest to square. */
  private[binary] def grayDims(d: Int): (Int, Int) = {
    var h = math.sqrt(d.toDouble).toInt
    while (d % h != 0) h -= 1
    (h, d / h)
  }

  /** Batched decode: (features, decodedForReal) per row. Real image path
    * first; stub fallback (or failure) per `stubbedFallback`. Signature
    * (batch in → batch out) matches what batched model inference needs. */
  private def decodeBatch(batch: Array[Array[Byte]], mod: String, d: Int,
                          allowStub: Boolean): Array[(Array[Float], Boolean)] = {
    val (gh, gw) = grayDims(d)
    batch.map { bytes =>
      if (bytes == null) null
      else {
        val real: Option[Array[Float]] = mod match {
          case "image" => graft.image.ImageFeatures.decodeResizeGray(bytes, gh, gw)
          case "audio" => AudioFeatures.decodeWavFeatures(bytes, d)
          case _ => VideoFeatures.decodeY4mFeatures(bytes, d)
        }
        real match {
          case Some(f) => (f, true)
          case None if allowStub =>
            MultimodalFeaturizer.warnStubOnce(mod)
            (stubFeatures(bytes, d), false)
          case None =>
            throw new IllegalArgumentException(
              s"payload did not decode as $mod and stubbedFallback=false")
        }
      }
    }
  }

  private def sniffMagic(bytes: Array[Byte]): String =
    if (bytes == null || bytes.length < 4) "unknown"
    else (bytes(0) & 0xff, bytes(1) & 0xff, bytes(2) & 0xff, bytes(3) & 0xff) match {
      case (0x89, 0x50, 0x4e, 0x47) => "png"
      case (0xff, 0xd8, _, _) => "jpeg"
      case (0x52, 0x49, 0x46, 0x46) => "riff" // wav/avi
      case (0x47, 0x49, 0x46, 0x38) => "gif"
      case (0x50, 0x4b, _, _) => "zip"
      case (0x59, 0x55, 0x56, 0x34) => "y4m" // "YUV4"MPEG2
      case _ => "unknown"
    }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val inIdx = df.schema.fieldIndex(graft.core.SchemaChecks.resolve(df.schema, getInputCol))
    val d = $(dim)
    val bs = $(batchSize)
    val mod = $(modality)
    val allowStub = $(stubbedFallback)
    val outSchema = transformSchema(df.schema)
    val enc = ExpressionEncoder(outSchema)
    df.mapPartitions { it =>
      // batch shape: group rows, decode as one batch (model-style), emit
      it.grouped(bs).flatMap { rows =>
        val payloads = rows.map(r =>
          if (r.isNullAt(inIdx)) null else r.getAs[Array[Byte]](inIdx)).toArray
        val feats = decodeBatch(payloads, mod, d, allowStub)
        rows.zip(feats).map { case (r, f) =>
          val bytes = if (r.isNullAt(inIdx)) null else r.getAs[Array[Byte]](inIdx)
          val meta = Row(mod,
            if (bytes == null) 0L else bytes.length.toLong, sniffMagic(bytes),
            if (f == null) false else f._2)
          Row.fromSeq(r.toSeq ++ Seq(meta, if (f == null) null else f._1.toSeq))
        }
      }
    }(enc)
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema ++ Seq(
      StructField("media_meta", metadataType),
      StructField(getOutputCol, ArrayType(FloatType))))
  override def copy(extra: ParamMap): MultimodalFeaturizer = defaultCopy(extra)
}

object MultimodalFeaturizer extends graft.core.GraftReadable[MultimodalFeaturizer] {
  // once per JVM per modality, not per row — executors log exactly one
  // loud line when the stub path is actually taken
  private val warned = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  private def warnStubOnce(mod: String): Unit =
    if (warned.add(mod))
      org.slf4j.LoggerFactory.getLogger(classOf[MultimodalFeaturizer]).warn(
        s"MultimodalFeaturizer: emitting STUB hash pseudo-embeddings for " +
          s"modality '$mod' (payload not decodable by a real in-container " +
          "codec). Set stubbedFallback=false to fail instead.")
}
