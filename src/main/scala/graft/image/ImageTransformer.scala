package graft.image

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** In-flight raw image: row-major, channel-interleaved unsigned bytes
  * (BGR for 3 channels, single plane for gray) — same layout as Spark's
  * ImageSchema `data` field.
  */
private[image] case class RawImage(origin: String, height: Int, width: Int,
    channels: Int, data: Array[Byte]) {
  @inline def at(y: Int, x: Int, c: Int): Int =
    data((y * width + x) * channels + c) & 0xff
}

/** Pure-JVM pixel kernels for the pipelined [[ImageTransformer]] stages
  * (capability parity with ref: opencv/.../ImageTransformer.scala:42-220,
  * which wraps OpenCV JNI; here each op is a deterministic Scala kernel so
  * the operator set works with zero native dependencies).
  *
  * Divergences from OpenCV, by design: borders are clamped (replicate)
  * rather than reflect-101, and `gaussianKernel` is a separable 2-D blur
  * (the reference's 1-D column filter is an OpenCV quirk).
  */
private[image] object ImageKernels {

  private def clamp(v: Int, lo: Int, hi: Int): Int =
    if (v < lo) lo else if (v > hi) hi else v

  /** Bilinear resize with OpenCV's pixel-center mapping
    * `src = (dst + 0.5) * scale - 0.5`. */
  def resize(img: RawImage, th: Int, tw: Int): RawImage = {
    val sy = img.height.toDouble / th
    val sx = img.width.toDouble / tw
    val out = new Array[Byte](th * tw * img.channels)
    var y = 0
    while (y < th) {
      val fy = (y + 0.5) * sy - 0.5
      val y0 = clamp(math.floor(fy).toInt, 0, img.height - 1)
      val y1 = clamp(y0 + 1, 0, img.height - 1)
      val wy = clamp01(fy - y0)
      var x = 0
      while (x < tw) {
        val fx = (x + 0.5) * sx - 0.5
        val x0 = clamp(math.floor(fx).toInt, 0, img.width - 1)
        val x1 = clamp(x0 + 1, 0, img.width - 1)
        val wx = clamp01(fx - x0)
        var c = 0
        while (c < img.channels) {
          val v =
            img.at(y0, x0, c) * (1 - wy) * (1 - wx) +
            img.at(y0, x1, c) * (1 - wy) * wx +
            img.at(y1, x0, c) * wy * (1 - wx) +
            img.at(y1, x1, c) * wy * wx
          out((y * tw + x) * img.channels + c) = math.round(v).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    img.copy(height = th, width = tw, data = out)
  }

  private def clamp01(v: Double): Double =
    if (v < 0) 0.0 else if (v > 1) 1.0 else v

  def crop(img: RawImage, x0: Int, y0: Int, h: Int, w: Int): RawImage = {
    require(x0 + w <= img.width && y0 + h <= img.height,
      s"crop ($x0,$y0,$h,$w) outside ${img.width}x${img.height}")
    val out = new Array[Byte](h * w * img.channels)
    var y = 0
    while (y < h) {
      System.arraycopy(img.data, ((y0 + y) * img.width + x0) * img.channels,
        out, y * w * img.channels, w * img.channels)
      y += 1
    }
    img.copy(height = h, width = w, data = out)
  }

  /** BGR → gray, OpenCV weights (0.299 R + 0.587 G + 0.114 B). */
  def bgr2gray(img: RawImage): RawImage = {
    require(img.channels == 3, s"bgr2gray needs 3 channels, got ${img.channels}")
    val out = new Array[Byte](img.height * img.width)
    var i = 0
    var p = 0
    while (p < out.length) {
      val b = img.data(i) & 0xff
      val g = img.data(i + 1) & 0xff
      val r = img.data(i + 2) & 0xff
      out(p) = math.round(0.299 * r + 0.587 * g + 0.114 * b).toByte
      p += 1; i += 3
    }
    img.copy(channels = 1, data = out)
  }

  def gray2bgr(img: RawImage): RawImage = {
    require(img.channels == 1, s"gray2bgr needs 1 channel, got ${img.channels}")
    val out = new Array[Byte](img.height * img.width * 3)
    var p = 0
    while (p < img.data.length) {
      val v = img.data(p)
      out(p * 3) = v; out(p * 3 + 1) = v; out(p * 3 + 2) = v
      p += 1
    }
    img.copy(channels = 3, data = out)
  }

  /** Box blur, kernel (kh × kw), OpenCV anchor (k/2), clamped borders. */
  def boxBlur(img: RawImage, kh: Int, kw: Int): RawImage =
    convolveSeparable(img,
      Array.fill(kw)(1.0 / kw), kw / 2,
      Array.fill(kh)(1.0 / kh), kh / 2)

  /** Separable gaussian blur; sigma <= 0 uses OpenCV's default rule. */
  def gaussian(img: RawImage, aperture: Int, sigmaIn: Double): RawImage = {
    val sigma = if (sigmaIn > 0) sigmaIn
      else 0.3 * ((aperture - 1) * 0.5 - 1) + 0.8
    val c = (aperture - 1) / 2.0
    val raw = Array.tabulate(aperture)(i =>
      math.exp(-(i - c) * (i - c) / (2 * sigma * sigma)))
    val sum = raw.sum
    val k = raw.map(_ / sum)
    convolveSeparable(img, k, aperture / 2, k, aperture / 2)
  }

  /** Horizontal then vertical 1-D convolution, doubles in between (one
    * final rounding), clamped borders. */
  private def convolveSeparable(img: RawImage, kx: Array[Double], ax: Int,
      ky: Array[Double], ay: Int): RawImage = {
    val h = img.height; val w = img.width; val ch = img.channels
    val tmp = new Array[Double](h * w * ch)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          var acc = 0.0
          var i = 0
          while (i < kx.length) {
            acc += kx(i) * img.at(y, clamp(x + i - ax, 0, w - 1), c)
            i += 1
          }
          tmp((y * w + x) * ch + c) = acc
          c += 1
        }
        x += 1
      }
      y += 1
    }
    val out = new Array[Byte](h * w * ch)
    y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var c = 0
        while (c < ch) {
          var acc = 0.0
          var i = 0
          while (i < ky.length) {
            acc += ky(i) * tmp((clamp(y + i - ay, 0, h - 1) * w + x) * ch + c)
            i += 1
          }
          out((y * w + x) * ch + c) = clamp(math.round(acc).toInt, 0, 255).toByte
          c += 1
        }
        x += 1
      }
      y += 1
    }
    img.copy(data = out)
  }

  /** Per-byte threshold, OpenCV semantics for the five classic types. */
  def threshold(img: RawImage, thresh: Double, maxVal: Double,
      kind: String): RawImage = {
    val t = thresh; val m = clamp(math.round(maxVal).toInt, 0, 255).toByte
    val out = img.data.map { byte =>
      val v = byte & 0xff
      kind match {
        case "binary" => if (v > t) m else 0.toByte
        case "binary_inv" => if (v > t) 0.toByte else m
        case "trunc" => if (v > t) clamp(math.round(t).toInt, 0, 255).toByte else byte
        case "tozero" => if (v > t) byte else 0.toByte
        case "tozero_inv" => if (v > t) 0.toByte else byte
        case other => throw new IllegalArgumentException(s"threshold type $other")
      }
    }
    img.copy(data = out)
  }

  /** flipCode 0: up-down; > 0: left-right; < 0: both (OpenCV codes). */
  def flip(img: RawImage, code: Int): RawImage = {
    val h = img.height; val w = img.width; val ch = img.channels
    val out = new Array[Byte](img.data.length)
    var y = 0
    while (y < h) {
      val sy = if (code == 0 || code < 0) h - 1 - y else y
      var x = 0
      while (x < w) {
        val sx = if (code != 0) w - 1 - x else x
        System.arraycopy(img.data, (sy * w + sx) * ch, out, (y * w + x) * ch, ch)
        x += 1
      }
      y += 1
    }
    img.copy(data = out)
  }
}

/** Pipelined image processing over an ImageSchema struct or raw binary
  * column: resize / crop / color-convert / box blur / gaussian blur /
  * threshold / flip, applied in declaration order inside ONE struct UDF —
  * a row is decoded once, flows through all stages as a primitive byte
  * array, and is re-encoded once (ref: opencv/.../ImageTransformer
  * .scala:230-330; same builder API, no JNI).
  *
  * Stages are kept as compact spec strings in a `StringArrayParam`, so the
  * transformer copies and persists like any params-only stage.
  */
class ImageTransformer(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("ImageTransformer"))
  setDefault(inputCol -> "image", outputCol -> "transformed")

  final val stages = new StringArrayParam(this, "stages",
    "encoded pipeline stage specs")
  setDefault(stages -> Array.empty[String])

  private def addStage(spec: String): this.type =
    set(stages, $(stages) :+ spec)

  def resize(height: Int, width: Int): this.type = {
    require(height > 0 && width > 0, "resize dims must be positive")
    addStage(s"resize:$height:$width")
  }
  def crop(x: Int, y: Int, height: Int, width: Int): this.type = {
    require(x >= 0 && y >= 0 && height > 0 && width > 0, "bad crop rect")
    addStage(s"crop:$x:$y:$height:$width")
  }
  def colorFormat(format: String): this.type = {
    require(Set("bgr2gray", "gray2bgr")(format), s"unknown format $format")
    addStage(s"color:$format")
  }
  def blur(height: Int, width: Int): this.type = {
    require(height > 0 && width > 0, "blur kernel must be positive")
    addStage(s"blur:$height:$width")
  }
  def gaussianKernel(apertureSize: Int, sigma: Double): this.type = {
    require(apertureSize > 0, "aperture must be positive")
    addStage(s"gaussian:$apertureSize:$sigma")
  }
  def threshold(threshold: Double, maxVal: Double, thresholdType: String): this.type =
    addStage(s"threshold:$thresholdType:$threshold:$maxVal")
  def flip(flipCode: Int): this.type = addStage(s"flip:$flipCode")

  private def applyStage(img: RawImage, spec: String): RawImage = {
    val parts = spec.split(":")
    parts(0) match {
      case "resize" => ImageKernels.resize(img, parts(1).toInt, parts(2).toInt)
      case "crop" => ImageKernels.crop(img, parts(1).toInt, parts(2).toInt,
        parts(3).toInt, parts(4).toInt)
      case "color" => parts(1) match {
        case "bgr2gray" => ImageKernels.bgr2gray(img)
        case "gray2bgr" => ImageKernels.gray2bgr(img)
      }
      case "blur" => ImageKernels.boxBlur(img, parts(1).toInt, parts(2).toInt)
      case "gaussian" => ImageKernels.gaussian(img, parts(1).toInt, parts(2).toDouble)
      case "threshold" => ImageKernels.threshold(img, parts(2).toDouble,
        parts(3).toDouble, parts(1))
      case "flip" => ImageKernels.flip(img, parts(1).toInt)
      case other => throw new IllegalArgumentException(s"unknown stage $other")
    }
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    val specs = $(stages)
    val isBinary = df.schema(getInputCol).dataType == BinaryType
    val run = (raw: RawImage) => {
      val outImg = specs.foldLeft(raw)(applyStage)
      val mode = if (outImg.channels == 1) 0 else ImageSchemaUtils.ocvType8UC3
      Row(outImg.origin, outImg.height, outImg.width, outImg.channels,
        mode, outImg.data)
    }
    val fromStruct = udf(new org.apache.spark.sql.api.java.UDF1[Row, Row] {
      override def call(img: Row): Row =
        if (img == null) null
        else run(RawImage(img.getString(0), img.getInt(1), img.getInt(2),
          img.getInt(3), img.getAs[Array[Byte]](5)))
    }, ImageSchemaUtils.imageType)
    val fromBinary = udf(new org.apache.spark.sql.api.java.UDF1[Array[Byte], Row] {
      override def call(bytes: Array[Byte]): Row =
        if (bytes == null) null
        else ImageSchemaUtils.decode("", bytes).map { r =>
          run(RawImage(r.getString(0), r.getInt(1), r.getInt(2), r.getInt(3),
            r.getAs[Array[Byte]](5)))
        }.orNull
    }, ImageSchemaUtils.imageType)
    df.withColumn(getOutputCol,
      if (isBinary) fromBinary(col(getInputCol)) else fromStruct(col(getInputCol)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, ImageSchemaUtils.imageType))
  override def copy(extra: ParamMap): ImageTransformer = defaultCopy(extra)
}
object ImageTransformer extends graft.core.GraftReadable[ImageTransformer]

