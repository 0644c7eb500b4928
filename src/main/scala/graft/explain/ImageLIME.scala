package graft.explain

import graft.core._
import graft.image.{ImageSchemaUtils, Superpixel}
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Encoders, Row}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Image LIME (ref: explainers/ImageLIME.scala + lime/LIME.scala:1-333):
  * segment each image into superpixels, sample random segment on/off
  * masks, score the masked images with the black box in ONE distributed
  * pass, then fit a weighted linear surrogate per image whose
  * coefficients rank segment importance.
  *
  * Same execution shape as [[TabularLIME]]: explode → score → groupByKey
  * + in-group solve; images never leave executors.
  */
class ImageLIME(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ImageLIME"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  setDefault(idCol -> "id")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val imageCol = new Param[String](this, "imageCol", "ImageSchema struct col")
  setDefault(imageCol -> "image")
  def setImageCol(v: String): this.type = set(imageCol, v)
  final val scoreCol = new Param[String](this, "scoreCol", "model output column")
  setDefault(scoreCol -> "prediction")
  def setScoreCol(v: String): this.type = set(scoreCol, v)
  final val numSamples = new IntParam(this, "numSamples", "masks per image")
  setDefault(numSamples -> 64)
  def setNumSamples(v: Int): this.type = set(numSamples, v)
  final val numSegments = new IntParam(this, "numSegments", "target superpixels")
  setDefault(numSegments -> 16)
  def setNumSegments(v: Int): this.type = set(numSegments, v)
  final val seed = new LongParam(this, "seed", "mask seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)

  final val scoringFn = new Param[DataFrame => DataFrame](this, "scoringFn",
    "black-box scoring function (persisted via Java serialization)")
  private def scorer: DataFrame => DataFrame = get(scoringFn).orNull
  def setModel(t: Transformer): this.type =
    set(scoringFn, (df: DataFrame) => t.transform(df))
  def setScoringFn(f: DataFrame => DataFrame): this.type = set(scoringFn, f)

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val nS = $(numSamples)
    val nSeg = $(numSegments)
    val sd = $(seed)
    val idIdx = df.schema.fieldIndex(SchemaChecks.resolve(df.schema, $(idCol)))
    val imgIdx = df.schema.fieldIndex(SchemaChecks.resolve(df.schema, $(imageCol)))

    val sampleSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__mask", ArrayType(DoubleType, containsNull = false)),
      StructField($(imageCol), ImageSchemaUtils.imageType)))
    val exploded = df.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(idIdx)
        val img = r.getStruct(imgIdx)
        val h = img.getInt(1); val w = img.getInt(2)
        val data = img.getAs[Array[Byte]](5)
        val (labels, k) = Superpixel.segment(h, w, data, nSeg)
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          // sample 0 = everything on (anchors the surrogate)
          val keep = Array.fill(k)(si == 0 || rng.nextBoolean())
          val masked = if (si == 0) data else Superpixel.mask(data, labels, keep)
          Row(rid, keep.map(b => if (b) 1.0 else 0.0).toSeq,
            Row(img.getString(0), h, w, 3, ImageSchemaUtils.ocvType8UC3, masked))
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded)
      .select(col("__id"), col("__mask"),
        col($(scoreCol)).cast("double").as("__y"))

    val outSchema = transformSchema(df.schema)
    val grouped = scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(_.getSeq[Double](1).toArray)
        val y = buf.map(_.getDouble(2))
        val w = Array.fill(buf.length)(1.0)
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lambda = 0.0)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
    grouped.toDF($(idCol), "intercept", "segment_importance")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField($(idCol), LongType),
      StructField("intercept", DoubleType),
      StructField("segment_importance",
        ArrayType(DoubleType, containsNull = false))))
  override def copy(extra: ParamMap): ImageLIME = {
    val c = new ImageLIME(uid); copyValues(c, extra)
  }
}
object ImageLIME extends graft.core.GraftReadable[ImageLIME]


/** Image Kernel SHAP (ref: explainers/ImageSHAP.scala): the same
  * superpixel masking sampler as [[ImageLIME]] under the KernelSHAP
  * coalition construction — pinned empty/full coalitions plus
  * kernel-size-sampled masks ([[ShapSampling]]) — so the per-segment
  * coefficients are SHAP values: `intercept ≈ f(all masked)` and
  * `intercept + Σφ ≈ f(image)`. Same execution shape: explode → one
  * scorer pass → groupByKey + in-group weighted solve.
  */
class ImageSHAP(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ImageSHAP"))

  final val idCol = new Param[String](this, "idCol", "unique row id column")
  setDefault(idCol -> "id")
  def setIdCol(v: String): this.type = set(idCol, v)
  final val imageCol = new Param[String](this, "imageCol", "ImageSchema struct col")
  setDefault(imageCol -> "image")
  def setImageCol(v: String): this.type = set(imageCol, v)
  final val scoreCol = new Param[String](this, "scoreCol", "model output column")
  setDefault(scoreCol -> "prediction")
  def setScoreCol(v: String): this.type = set(scoreCol, v)
  final val numSamples = new IntParam(this, "numSamples", "coalitions per image")
  setDefault(numSamples -> 64)
  def setNumSamples(v: Int): this.type = set(numSamples, v)
  final val numSegments = new IntParam(this, "numSegments", "target superpixels")
  setDefault(numSegments -> 16)
  def setNumSegments(v: Int): this.type = set(numSegments, v)
  final val seed = new LongParam(this, "seed", "coalition seed")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)

  final val scoringFn = new Param[DataFrame => DataFrame](this, "scoringFn",
    "black-box scoring function (persisted via Java serialization)")
  private def scorer: DataFrame => DataFrame = get(scoringFn).orNull
  def setModel(t: Transformer): this.type =
    set(scoringFn, (df: DataFrame) => t.transform(df))
  def setScoringFn(f: DataFrame => DataFrame): this.type = set(scoringFn, f)

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    require(scorer != null, "setModel/setScoringFn first")
    val df = ds.toDF()
    val nS = math.max($(numSamples), 4)
    val nSeg = $(numSegments)
    val sd = $(seed)
    val idIdx = df.schema.fieldIndex(SchemaChecks.resolve(df.schema, $(idCol)))
    val imgIdx = df.schema.fieldIndex(SchemaChecks.resolve(df.schema, $(imageCol)))

    val sampleSchema = StructType(Seq(
      StructField("__id", LongType),
      StructField("__w", DoubleType),
      StructField("__mask", ArrayType(DoubleType, containsNull = false)),
      StructField($(imageCol), ImageSchemaUtils.imageType)))
    val exploded = df.mapPartitions { it =>
      it.flatMap { r =>
        val rid = r.getLong(idIdx)
        val img = r.getStruct(imgIdx)
        val h = img.getInt(1); val w = img.getInt(2)
        val data = img.getAs[Array[Byte]](5)
        val (labels, k) = Superpixel.segment(h, w, data, nSeg)
        val cdf = ShapSampling.sizeCdf(k)
        (0 until nS).iterator.map { si =>
          val rng = new java.util.Random(mix(mix(sd ^ rid) ^ si))
          val (keep, weight) = ShapSampling.coalition(rng, k, si, cdf)
          val masked =
            if (keep.forall(identity)) data
            else Superpixel.mask(data, labels, keep)
          Row(rid, weight, keep.map(b => if (b) 1.0 else 0.0).toSeq,
            Row(img.getString(0), h, w, 3, ImageSchemaUtils.ocvType8UC3, masked))
        }
      }
    }(ExpressionEncoder(sampleSchema))

    val scored = scorer(exploded)
      .select(col("__id"), col("__w"), col("__mask"),
        col($(scoreCol)).cast("double").as("__y"))

    val outSchema = transformSchema(df.schema)
    scored.groupByKey(_.getLong(0))(Encoders.scalaLong)
      .mapGroups { (rid, rows) =>
        val buf = rows.toArray
        val x = buf.map(_.getSeq[Double](2).toArray)
        val w = buf.map(_.getDouble(1))
        val y = buf.map(_.getDouble(3))
        val (b0, beta) = WeightedLinearSolver.fit(x, y, w, lambda = 0.0)
        Row(rid, b0, beta.toSeq)
      }(ExpressionEncoder(outSchema))
      .toDF($(idCol), "intercept", "segment_shap")
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(Seq(
      StructField($(idCol), LongType),
      StructField("intercept", DoubleType),
      StructField("segment_shap",
        ArrayType(DoubleType, containsNull = false))))
  override def copy(extra: ParamMap): ImageSHAP = {
    val c = new ImageSHAP(uid); copyValues(c, extra)
  }
}
object ImageSHAP extends graft.core.GraftReadable[ImageSHAP]

