package graft.io.binary

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** 64-bit energy-contour audio fingerprint (the sign-of-difference
  * construction of Haitsma & Kalker 2002, "A Highly Robust Audio
  * Fingerprinting System", ISMIR — public literature — reduced to the
  * time axis): decode to mono ([[AudioFeatures.decodeMono]], the same
  * pure-JVM path the multimodal featurizer uses) → 64 equal-length
  * windows → energy per window → bit i set iff window i is louder than
  * window i+1 (63 bits; bit 63 reserved zero, matching
  * [[graft.image.PerceptualHash]]'s layout).
  *
  * Comparing energy RATIOS makes the fingerprint invariant under
  * uniform volume scaling — every window's energy scales by the same
  * factor, so no comparison flips (the audio re-encode byte-exact
  * hashing cannot survive, exactly as brightness is for images).
  * Equal-energy neighbours emit a stable 0 (strict `>`). Null or
  * undecodable payloads fingerprint as null — no evidence, keep.
  */
class AudioFingerprint(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("AudioFingerprint"))
  setDefault(outputCol -> "audio_fp")

  override def transform(ds: Dataset[_]): DataFrame = {
    val fpUdf = udf((b: Array[Byte]) => AudioFingerprint.fp64(b))
    ds.toDF().withColumn(getOutputCol, fpUdf(col(getInputCol)))
  }

  override def transformSchema(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(getOutputCol),
      s"input already has a column named '$getOutputCol'")
    StructType(schema :+ StructField(getOutputCol, LongType))
  }
  override def copy(extra: ParamMap): AudioFingerprint = defaultCopy(extra)
}

object AudioFingerprint extends GraftReadable[AudioFingerprint] {
  /** Contour windows; 63 adjacent-window comparisons = the bit width. */
  val Windows = 64

  /** Fingerprint of decodable audio bytes; null for null/undecodable. */
  def fp64(bytes: Array[Byte]): java.lang.Long =
    AudioFeatures.decodeMono(bytes) match {
      case None => null
      case Some((mono, _, _)) =>
        val n = mono.length
        if (n < Windows) return null // sub-window clip: no contour evidence
        val e = new Array[Double](Windows)
        var w = 0
        while (w < Windows) {
          val lo = (w.toLong * n / Windows).toInt
          val hi = ((w + 1).toLong * n / Windows).toInt
          var acc = 0.0
          var j = lo
          while (j < hi) { acc += mono(j) * mono(j); j += 1 }
          e(w) = acc
          w += 1
        }
        var bits = 0L
        w = 0
        while (w < Windows - 1) {
          if (e(w) > e(w + 1)) bits |= 1L << w
          w += 1
        }
        java.lang.Long.valueOf(bits)
    }
}

/** Near-duplicate audio removal over the energy-contour fingerprint —
  * the audio member of the multimodal dedup family (text SimHash,
  * image pHash, audio contour; all three share
  * [[graft.dedup.DedupFunctions.hammingDupIds]]'s Manku pigeonhole and
  * the smallest-id-survives rule). Decode runs ONCE into a checkpointed
  * narrow (id, fp) frame (the [[graft.image.ImagePHashDeduplicator]]
  * shape — decode is the expensive step; 16 bytes/row ride the
  * machinery). Undecodable or null payloads are always KEPT. */
class AudioFingerprintDeduplicator(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("AudioFingerprintDeduplicator"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  /** Volume re-encodes land at hamming 0 by construction, so the
    * default ball is tighter than the image family's (6): 4 tolerates
    * mild clipping/requantization noise while keeping C(6,2)=15 bucket
    * tables with ~21-bit keys. */
  final val maxHamming = new IntParam(this, "maxHamming",
    "hamming cutoff", ParamValidators.gtEq(0))
  setDefault(maxHamming -> 4)
  def setMaxHamming(v: Int): this.type = set(maxHamming, v)
  final val blocks = new IntParam(this, "blocks",
    "pigeonhole blocks (> maxHamming; key width grows with blocks-maxHamming)",
    ParamValidators.gt(0))
  setDefault(blocks -> 6)
  def setBlocks(v: Int): this.type = set(blocks, v)
  final val maxBucketSize = new IntParam(this, "maxBucketSize",
    "per-bucket candidate cap (skew guard)", ParamValidators.gt(0))
  setDefault(maxBucketSize -> 1000)
  def setMaxBucketSize(v: Int): this.type = set(maxBucketSize, v)

  /** Default FALSE, unlike [[graft.image.ImagePHashDeduplicator]]: the
    * contour decode is one cheap pass over the samples, and shuffling
    * full audio payloads to gain parallelism was measured to LOSE at
    * the 100x corpus (154 → 311 s, SCALING.md round 16). Flip on for
    * genuinely few-split scans of expensive-to-decode formats. */
  final val spreadDecode = new BooleanParam(this, "spreadDecode",
    "repartition (id, bytes) across all slots before decoding when the " +
      "scan gave fewer partitions than slots")
  setDefault(spreadDecode -> false)
  def setSpreadDecode(v: Boolean): this.type = set(spreadDecode, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    import graft.dedup.DedupFunctions._
    val df = ds.toDF()
    val id = col($(idCol))
    val fpUdf = udf((b: Array[Byte]) => AudioFingerprint.fp64(b))
    val narrow = df.select(id.cast("long").as("__id"),
      col(getInputCol).as("__bytes"))
    val slots = df.sparkSession.sparkContext.defaultParallelism
    val spread =
      if ($(spreadDecode) && narrow.rdd.getNumPartitions < slots)
        narrow.repartition(slots)
      else narrow
    val fps = spread
      .select(col("__id"), fpUdf(col("__bytes")).as("__fp"))
      .filter(col("__fp").isNotNull)
      .localCheckpoint()
    val dupIds = hammingDupIds(fps, col("__id"), "__fp", $(maxHamming),
      $(blocks), $(maxBucketSize), s"${uid}_dropped")
    df.join(dupIds, id.cast("long") === col("__dup_id"), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): AudioFingerprintDeduplicator =
    defaultCopy(extra)
}
object AudioFingerprintDeduplicator
    extends GraftReadable[AudioFingerprintDeduplicator]
