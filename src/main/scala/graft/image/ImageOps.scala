package graft.image

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.awt.image.BufferedImage
import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

/** Image column operators on Spark's standard ImageSchema struct
  * (origin, height, width, nChannels, mode, data BGR bytes) — the
  * reference's schema is identical (ref: core/.../schema/ImageSchemaUtils
  * .scala:40-52). Decode/resize run pure-JVM via java.awt, following the
  * reference's own OpenCV-free path (core/.../image/ResizeImageTransformer
  * .scala:1-110).
  */
object ImageSchemaUtils {
  val imageType: StructType = StructType(Seq(
    StructField("origin", StringType),
    StructField("height", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("nChannels", IntegerType, nullable = false),
    StructField("mode", IntegerType, nullable = false),
    StructField("data", BinaryType, nullable = false)))

  val ocvType8UC3 = 16 // CV_8UC3: 3-channel bytes, BGR

  /** Decode encoded bytes (png/jpg/...) to an image-struct Row. */
  def decode(origin: String, bytes: Array[Byte]): Option[Row] = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    if (img == null) None
    else {
      val h = img.getHeight; val w = img.getWidth
      val data = new Array[Byte](h * w * 3)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val rgb = img.getRGB(x, y)
          val base = (y * w + x) * 3
          data(base) = (rgb & 0xff).toByte              // B
          data(base + 1) = ((rgb >> 8) & 0xff).toByte   // G
          data(base + 2) = ((rgb >> 16) & 0xff).toByte  // R
          x += 1
        }
        y += 1
      }
      Some(Row(origin, h, w, 3, ocvType8UC3, data))
    }
  }

  def toBufferedImage(height: Int, width: Int, data: Array[Byte]): BufferedImage = {
    val img = new BufferedImage(width, height, BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val base = (y * width + x) * 3
        val b = data(base) & 0xff
        val g = data(base + 1) & 0xff
        val r = data(base + 2) & 0xff
        img.setRGB(x, y, (r << 16) | (g << 8) | b)
        x += 1
      }
      y += 1
    }
    img
  }
}

/** Decode a binary column (encoded image bytes) into an ImageSchema
  * struct column. Rows that fail to decode become null (tolerant path,
  * like Spark's image source with dropInvalid=false). */
class DecodeImage(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("DecodeImage"))
  setDefault(outputCol -> "image")

  override def transform(ds: Dataset[_]): DataFrame = {
    // Java-UDF form: Row-returning closures need an explicit result schema
    val decodeUdf = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row =
        if (bytes == null) null
        else ImageSchemaUtils.decode("", bytes).orNull
    }, ImageSchemaUtils.imageType)
    ds.toDF().withColumn(getOutputCol, decodeUdf(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, ImageSchemaUtils.imageType))
  override def copy(extra: ParamMap): DecodeImage = defaultCopy(extra)
}
object DecodeImage extends graft.core.GraftReadable[DecodeImage]


/** Resize an ImageSchema struct column (bilinear, java.awt). */
class ResizeImage(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ResizeImage"))
  setDefault(inputCol -> "image", outputCol -> "resized")

  final val height = new IntParam(this, "height", "", ParamValidators.gt(0))
  setDefault(height -> 224)
  def setHeight(v: Int): this.type = set(height, v)
  final val width = new IntParam(this, "width", "", ParamValidators.gt(0))
  setDefault(width -> 224)
  def setWidth(v: Int): this.type = set(width, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val th = $(height); val tw = $(width)
    val resizeUdf = udf(new org.apache.spark.sql.api.java.UDF1[Row, Row] {
      override def call(img: Row): Row =
      if (img == null) null
      else {
        val h = img.getInt(1); val w = img.getInt(2)
        val src = ImageSchemaUtils.toBufferedImage(h, w, img.getAs[Array[Byte]](5))
        val dst = new BufferedImage(tw, th, BufferedImage.TYPE_INT_RGB)
        val g = dst.createGraphics()
        g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
          java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR)
        g.drawImage(src, 0, 0, tw, th, null)
        g.dispose()
        val data = new Array[Byte](th * tw * 3)
        var y = 0
        while (y < th) {
          var x = 0
          while (x < tw) {
            val rgb = dst.getRGB(x, y)
            val base = (y * tw + x) * 3
            data(base) = (rgb & 0xff).toByte
            data(base + 1) = ((rgb >> 8) & 0xff).toByte
            data(base + 2) = ((rgb >> 16) & 0xff).toByte
            x += 1
          }
          y += 1
        }
        Row(img.getString(0), th, tw, 3, ImageSchemaUtils.ocvType8UC3, data)
      }
    }, ImageSchemaUtils.imageType)
    // (closure defined via UDF1 so the struct result schema is explicit)
    ds.toDF().withColumn(getOutputCol, resizeUdf(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, ImageSchemaUtils.imageType))
  override def copy(extra: ParamMap): ResizeImage = defaultCopy(extra)
}
object ResizeImage extends graft.core.GraftReadable[ResizeImage]


/** Unroll an ImageSchema struct to an ml Vector, row-major BGR, optional
  * [0,1] normalization (ref: core/.../image/UnrollImage.scala:30-173). */
class UnrollImage(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("UnrollImage"))
  setDefault(inputCol -> "image", outputCol -> "unrolled")

  final val normalize = new BooleanParam(this, "normalize", "divide by 255")
  setDefault(normalize -> false)
  def setNormalize(v: Boolean): this.type = set(normalize, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val norm = $(normalize)
    val unrollUdf = udf((img: Row) => {
      if (img == null) null
      else {
        val data = img.getAs[Array[Byte]](5)
        val arr = new Array[Double](data.length)
        var i = 0
        while (i < data.length) {
          arr(i) = if (norm) (data(i) & 0xff) / 255.0 else (data(i) & 0xff).toDouble
          i += 1
        }
        Vectors.dense(arr)
      }
    })
    ds.toDF().withColumn(getOutputCol, unrollUdf(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): UnrollImage = defaultCopy(extra)
}
object UnrollImage extends graft.core.GraftReadable[UnrollImage]


/** Decode encoded image bytes → bilinear resize → grayscale → row-major
  * [0,1] floats: the REAL decode behind MultimodalFeaturizer's image
  * modality (DecodeImage → resize → unroll compressed into one
  * allocation-lean pass over the same kernels). Deterministic for
  * PNG/BMP/GIF (exact codecs), so suites golden-gate the output pixels.
  */
object ImageFeatures {
  def decodeResizeGray(bytes: Array[Byte], height: Int,
                       width: Int): Option[Array[Float]] = {
    // ImageIO plugins throw RuntimeExceptions on malformed payloads
    // (CMMException, ArrayIndexOutOfBounds in PNG/GIF readers) — all
    // undecodable inputs must take the stubbedFallback path, not fail the
    // task. The catch covers ONLY the decode: a crash in our own
    // resize/grayscale kernels is a bug that should fail loudly.
    val decoded =
      try Option(bytes).flatMap(b => ImageSchemaUtils.decode("", b))
      catch { case scala.util.control.NonFatal(_) => None }
    decoded.map { row =>
      val raw = RawImage("", row.getInt(1), row.getInt(2), row.getInt(3),
        row.getAs[Array[Byte]](5))
      val gray = ImageKernels.bgr2gray(ImageKernels.resize(raw, height, width))
      val out = new Array[Float](gray.data.length)
      var i = 0
      while (i < out.length) { out(i) = (gray.data(i) & 0xff) / 255f; i += 1 }
      out
    }
  }
}
