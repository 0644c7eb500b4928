package graft.dedup

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Deduplication operators for training-data pipelines. All designed
  * around ONE property: never materialize the O(n^2) pair space — candidate
  * generation always goes through a bucket join (band hash, simhash chunk,
  * hyperplane bucket) so the shuffle is O(n·bands) and skew-bounded.
  *
  * (Beyond the reference's own surface; standard MinHash/SimHash/LSH
  * constructions from the public literature — Broder '97, Charikar '02 —
  * expressed as native Spark SQL expressions.)
  */
object DedupFunctions {

  /** Canonical text form used by every dedup operator: lowercase,
    * whitespace-collapsed, trimmed. */
  def canonical(c: Column): Column =
    lower(regexp_replace(trim(c), "\\s+", " "))

  /** Word k-shingles of the canonical text, as distinct array. */
  def shingles(c: Column, k: Int): Column = {
    val toks = split(canonical(c), " ")
    array_distinct(filter(
      transform(toks, (_: Column, i: Column) =>
        array_join(slice(toks, i + 1, lit(k)), " ")),
      (_: Column, i: Column) => i <= size(toks) - k))
  }

  /** Sorted distinct 64-bit hashes of the word k-shingles — the canonical
    * set representation every near-dup operator works on. 8 bytes/shingle
    * through the shuffle instead of the shingle text, and sortedness lets
    * Jaccard run as a merge instead of a hash-set intersect. Backed by the
    * native single-pass [[graft.functions.HashExpressions.HashedWordShingles]]
    * expression — no shingle strings are ever materialized. */
  def hashedShingles(c: Column, k: Int): Column =
    graft.functions.HashExpressions.hashedWordShingles(c, k)

  /** MinHash signature over pre-hashed shingles: one primitive pass via the
    * native [[graft.functions.HashExpressions.MinHashSignature]] expression
    * (Kirsch-Mitzenmacher g_i(x) = x + i·mix(x)) — vs `numHashes` separate
    * interpreted `array_min(transform(...))` traversals. */
  def minHashSignature(hashedShingleCol: Column, numHashes: Int): Column =
    graft.functions.HashExpressions.minHashSignature(hashedShingleCol, numHashes)

  /** Band hashes of a minhash signature: `bands` values, each hashing
    * `rowsPerBand` consecutive signature entries (xxhash64 consumes the
    * long-array slice directly — no string building). */
  def bandHashes(sig: Column, bands: Int, rowsPerBand: Int): Column =
    array((0 until bands).map { b =>
      xxhash64(lit(b), slice(sig, b * rowsPerBand + 1, rowsPerBand))
    }: _*)

  /** Exact Jaccard similarity of two SORTED `array<long>` hashed-shingle
    * sets — single codegen'd merge pass. */
  def jaccard(a: Column, b: Column): Column =
    graft.functions.HashExpressions.sortedLongJaccard(a, b)

  /** 64-bit SimHash of the token array (Charikar random hyperplane over
    * token hashes). Single pass per row via UDF — the per-token inner loop
    * over 64 bits is cheaper in JVM code than 64 separate aggregates. */
  val simHash64: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((tokens: Seq[String]) => {
      if (tokens == null) null
      else {
        val acc = new Array[Int](64)
        tokens.foreach { t =>
          // xxhash-style avalanche of the string hash for bit diffusion
          var h = scala.util.hashing.MurmurHash3.stringHash(t).toLong
          h = (h ^ (h >>> 33)) * 0xff51afd7ed558ccdL
          h = (h ^ (h >>> 33)) * 0xc4ceb9fe1a85ec53L
          h ^= (h >>> 33)
          var b = 0
          while (b < 64) {
            if (((h >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
            b += 1
          }
        }
        var out = 0L
        var b = 0
        while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
        java.lang.Long.valueOf(out)
      }
    })

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))
}

/** Exact deduplication: keep one row (smallest id) per identical canonical
  * text. One shuffle, on a 64-bit fingerprint+id — the full text rides
  * along only once; at 100 TB the shuffled key is 16 bytes/row.
  */
class ExactDeduplicator(override val uid: String) extends Transformer
    with HasInputCol {
  def this() = this(Identifiable.randomUID("ExactDeduplicator"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val fp = DedupFunctions.canonical(col(getInputCol))
    val w = Window.partitionBy(fp).orderBy(col($(idCol)))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): ExactDeduplicator = defaultCopy(extra)
}

/** MinHash+LSH near-duplicate removal: shingle → minhash → band →
  * bucket-join. A row is dropped when any band bucket contains a surviving
  * candidate with smaller id whose verified Jaccard ≥ threshold.
  *
  * Shuffles: explode to n·bands rows of (bandHash, id) — narrow payload —
  * then a self-join per bucket. Buckets are capped (`maxBucketSize`) so a
  * degenerate bucket (e.g. empty docs) cannot quadratically explode.
  */
class MinHashDeduplicator(override val uid: String) extends Transformer
    with HasInputCol {
  def this() = this(Identifiable.randomUID("MinHashDeduplicator"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val shingleSize = new IntParam(this, "shingleSize", "word shingle k")
  setDefault(shingleSize -> 3)
  def setShingleSize(v: Int): this.type = set(shingleSize, v)
  final val numHashes = new IntParam(this, "numHashes", "signature length")
  setDefault(numHashes -> 128)
  def setNumHashes(v: Int): this.type = set(numHashes, v)
  final val bands = new IntParam(this, "bands", "LSH bands")
  setDefault(bands -> 32)
  def setBands(v: Int): this.type = set(bands, v)
  final val threshold = new DoubleParam(this, "threshold", "Jaccard cutoff")
  setDefault(threshold -> 0.8)
  def setThreshold(v: Double): this.type = set(threshold, v)
  final val maxBucketSize = new IntParam(this, "maxBucketSize",
    "per-bucket candidate cap (skew guard)")
  setDefault(maxBucketSize -> 1000)

  override def transform(ds: Dataset[_]): DataFrame = {
    import DedupFunctions._
    val df = ds.toDF()
    val id = col($(idCol))
    val r = $(numHashes) / $(bands)

    val withSig = df
      .withColumn("__sh", hashedShingles(col(getInputCol), $(shingleSize)))
      .withColumn("__sig", minHashSignature(col("__sh"), $(numHashes)))
    // (bandIdx implicit in hash) -> narrow (bucket, id, shingles) rows
    val buckets = withSig
      .select(id.as("__id"), col("__sh"),
        explode(bandHashes(col("__sig"), $(bands), r)).as("__bucket"))
    // skew guard: cap candidates considered per bucket
    val wB = Window.partitionBy(col("__bucket")).orderBy(col("__id"))
    val capped = buckets
      .withColumn("__bn", row_number().over(wB))
      .filter(col("__bn") <= $(maxBucketSize))
    val l = capped.select(col("__bucket"), col("__id").as("__id_l"), col("__sh").as("__sh_l"))
    val rgt = capped.select(col("__bucket"), col("__id").as("__id_r"), col("__sh").as("__sh_r"))
    // candidate pairs (smaller id on the left), verified by exact Jaccard
    val dupIds = l.join(rgt, Seq("__bucket"))
      .filter(col("__id_l") < col("__id_r"))
      .filter(jaccard(col("__sh_l"), col("__sh_r")) >= $(threshold))
      .select(col("__id_r").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): MinHashDeduplicator = defaultCopy(extra)
}

/** SimHash near-duplicate removal: 64-bit simhash, candidates via the
  * pigeonhole principle (split fingerprint into `chunks` pieces; any pair
  * within `maxHamming` must agree on ≥1 chunk), verified by exact Hamming
  * distance.
  */
class SimHashDeduplicator(override val uid: String) extends Transformer
    with HasInputCol {
  def this() = this(Identifiable.randomUID("SimHashDeduplicator"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val maxHamming = new IntParam(this, "maxHamming", "hamming cutoff")
  setDefault(maxHamming -> 3)
  def setMaxHamming(v: Int): this.type = set(maxHamming, v)

  private val chunks = 4

  override def transform(ds: Dataset[_]): DataFrame = {
    import DedupFunctions._
    val df = ds.toDF()
    val id = col($(idCol))
    val withFp = df.withColumn("__fp",
      simHash64(split(canonical(col(getInputCol)), " ")))
    val chunkCols = (0 until chunks).map { i =>
      struct(lit(i).as("ci"),
        shiftright(col("__fp"), i * 16).bitwiseAND(lit(0xFFFFL)).as("cv"))
    }
    val exploded = withFp.select(id.as("__id"), col("__fp"),
      explode(array(chunkCols: _*)).as("__chunk"))
    val l = exploded.select(col("__chunk"), col("__id").as("__id_l"), col("__fp").as("__fp_l"))
    val rgt = exploded.select(col("__chunk"), col("__id").as("__id_r"), col("__fp").as("__fp_r"))
    val dupIds = l.join(rgt, Seq("__chunk"))
      .filter(col("__id_l") < col("__id_r"))
      .filter(hamming64(col("__fp_l"), col("__fp_r")) <= $(maxHamming))
      .select(col("__id_r").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): SimHashDeduplicator = defaultCopy(extra)
}

/** N-gram Jaccard dedup without minhash: inverted index on a sampled
  * subset of each document's shingles (rarest-first would need a global DF;
  * we take the `indexShingles` smallest hashes — a deterministic sample
  * that any true near-duplicate shares with high probability), then exact
  * Jaccard verification.
  */
class NGramJaccardDeduplicator(override val uid: String) extends Transformer
    with HasInputCol {
  def this() = this(Identifiable.randomUID("NGramJaccardDeduplicator"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val shingleSize = new IntParam(this, "shingleSize", "word n-gram n")
  setDefault(shingleSize -> 3)
  final val indexShingles = new IntParam(this, "indexShingles",
    "number of min-hashed shingles to index per doc")
  setDefault(indexShingles -> 8)
  final val threshold = new DoubleParam(this, "threshold", "Jaccard cutoff")
  setDefault(threshold -> 0.8)
  def setThreshold(v: Double): this.type = set(threshold, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    import DedupFunctions._
    val df = ds.toDF()
    val id = col($(idCol))
    val withSh = df.withColumn("__sh",
      hashedShingles(col(getInputCol), $(shingleSize)))
    // deterministic sample: the indexShingles shingles with smallest hash
    // (the hashed-shingle array is already sorted, so this is a prefix)
    val sampled = withSh.withColumn("__probe",
      slice(col("__sh"), 1, $(indexShingles)))
    val inv = sampled.select(id.as("__id"), col("__sh"),
      explode(col("__probe")).as("__key"))
    val l = inv.select(col("__key"), col("__id").as("__id_l"), col("__sh").as("__sh_l"))
    val rgt = inv.select(col("__key"), col("__id").as("__id_r"), col("__sh").as("__sh_r"))
    val dupIds = l.join(rgt, Seq("__key"))
      .filter(col("__id_l") < col("__id_r"))
      .filter(jaccard(col("__sh_l"), col("__sh_r")) >= $(threshold))
      .select(col("__id_r").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): NGramJaccardDeduplicator = defaultCopy(extra)
}

/** Embedding cosine near-duplicate removal: random-hyperplane LSH buckets
  * (sign bits of `numPlanes` fixed pseudo-random projections, split into
  * bands) then exact cosine verification ≥ threshold.
  */
class EmbeddingNearDupDeduplicator(override val uid: String) extends Transformer
    with HasInputCol {
  def this() = this(Identifiable.randomUID("EmbeddingNearDup"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val threshold = new DoubleParam(this, "threshold", "cosine cutoff")
  setDefault(threshold -> 0.95)
  def setThreshold(v: Double): this.type = set(threshold, v)
  final val numPlanes = new IntParam(this, "numPlanes", "hyperplanes total")
  setDefault(numPlanes -> 16)
  final val bands = new IntParam(this, "bands", "bands over sign bits")
  setDefault(bands -> 4)
  final val seed = new LongParam(this, "seed", "hyperplane seed")
  setDefault(seed -> 42L)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val id = col($(idCol))
    val dim = df.select(size(col(getInputCol))).head().getInt(0)
    val planes = graft.sim.SimilarityFunctions
      .randomPlanes($(numPlanes), dim, $(seed))
    val sigCol = graft.sim.SimilarityFunctions
      .hyperplaneSignature(col(getInputCol), planes)
    val bits = $(numPlanes) / $(bands)
    val bandCols = (0 until $(bands)).map { b =>
      struct(lit(b).as("bi"),
        shiftright(sigCol, b * bits).bitwiseAND(lit((1L << bits) - 1)).as("bv"))
    }
    val exploded = df.select(id.as("__id"), col(getInputCol).as("__v"),
      explode(array(bandCols: _*)).as("__band"))
    val l = exploded.select(col("__band"), col("__id").as("__id_l"), col("__v").as("__v_l"))
    val rgt = exploded.select(col("__band"), col("__id").as("__id_r"), col("__v").as("__v_r"))
    val cos = graft.sim.SimilarityFunctions.cosine(col("__v_l"), col("__v_r"))
    val dupIds = l.join(rgt, Seq("__band"))
      .filter(col("__id_l") < col("__id_r"))
      .filter(cos >= $(threshold))
      .select(col("__id_r").as("__dup_id")).distinct()
    df.join(dupIds, id === col("__dup_id"), "left_anti")
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): EmbeddingNearDupDeduplicator = defaultCopy(extra)
}
