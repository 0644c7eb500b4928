package graft.featurize

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.{SparseVector, Vectors}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Murmur3 x86_32 (public algorithm, Austin Appleby) — the hash family the
  * VW-style featurizer needs for exact feature-index compatibility
  * (ref: vw/.../VowpalWabbitMurmurWithPrefix.scala:1-77). Implemented
  * directly (Scala's MurmurHash3 uses different seeding/finalization).
  */
object Murmur3 {
  def hash32(data: Array[Byte], seed: Int): Int = {
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = seed
    val nBlocks = data.length / 4
    var i = 0
    while (i < nBlocks) {
      var k = (data(i * 4) & 0xff) | ((data(i * 4 + 1) & 0xff) << 8) |
        ((data(i * 4 + 2) & 0xff) << 16) | ((data(i * 4 + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 1
    }
    var k = 0
    val tail = nBlocks * 4
    (data.length & 3) match {
      case 3 =>
        k ^= (data(tail + 2) & 0xff) << 16
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 2 =>
        k ^= (data(tail + 1) & 0xff) << 8
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case 1 =>
        k ^= data(tail) & 0xff
        k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
      case _ =>
    }
    h ^= data.length
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }
  def hashString(s: String, seed: Int): Int =
    hash32(s.getBytes(java.nio.charset.StandardCharsets.UTF_8), seed)
}

/** VW-style hashing featurizer (ref: vw/.../VowpalWabbitFeaturizer
  * .scala:65-120 + the per-type featurizer files): every input column
  * becomes sparse
  * features in a 2^numBits space —
  *  - numeric column: index = murmur(colName), value = x
  *  - string column: index = murmur(colName + "=" + value), value = 1
  *  - string array: one indicator per element
  * Collisions add (VW semantics). Pure expression-free row map, no
  * shuffle; the output is an ml SparseVector ready for any Spark ML
  * learner.
  */
class VowpalHashFeaturizer(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("VowpalHashFeaturizer"))
  setDefault(outputCol -> "features")

  final val numBits = new IntParam(this, "numBits", "log2 feature space",
    ParamValidators.inRange(1, 30))
  setDefault(numBits -> 18)
  def setNumBits(v: Int): this.type = set(numBits, v)
  final val seed = new IntParam(this, "seed", "murmur seed")
  setDefault(seed -> 0)
  def setSeed(v: Int): this.type = set(seed, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val mask = (1 << $(numBits)) - 1
    val dim = 1 << $(numBits)
    val sd = $(seed)
    val inCols = $(inputCols)
    val schema = df.schema
    val types = inCols.map(c => schema(c).dataType)
    val featurizeUdf = udf { (r: Row) =>
      val acc = scala.collection.mutable.HashMap.empty[Int, Double]
      var i = 0
      while (i < inCols.length) {
        if (!r.isNullAt(i)) {
          types(i) match {
            case StringType =>
              val idx = Murmur3.hashString(inCols(i) + "=" + r.getString(i), sd) & mask
              acc(idx) = acc.getOrElse(idx, 0.0) + 1.0
            case ArrayType(StringType, _) =>
              r.getSeq[String](i).foreach { v =>
                val idx = Murmur3.hashString(inCols(i) + "=" + v, sd) & mask
                acc(idx) = acc.getOrElse(idx, 0.0) + 1.0
              }
            case _: NumericType =>
              val x = r.get(i) match {
                case n: Number => n.doubleValue()
                case other => throw new IllegalArgumentException(s"$other")
              }
              if (x != 0.0) {
                val idx = Murmur3.hashString(inCols(i), sd) & mask
                acc(idx) = acc.getOrElse(idx, 0.0) + x
              }
            case BooleanType =>
              if (r.getBoolean(i)) {
                val idx = Murmur3.hashString(inCols(i), sd) & mask
                acc(idx) = acc.getOrElse(idx, 0.0) + 1.0
              }
            case other =>
              throw new IllegalArgumentException(s"unsupported type $other")
          }
        }
        i += 1
      }
      val sorted = acc.toArray.sortBy(_._1)
      Vectors.sparse(dim, sorted.map(_._1), sorted.map(_._2))
    }
    df.withColumn(getOutputCol,
      featurizeUdf(struct(inCols.map(col).toIndexedSeq: _*)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): VowpalHashFeaturizer = defaultCopy(extra)
}
object VowpalHashFeaturizer extends graft.core.GraftReadable[VowpalHashFeaturizer]

