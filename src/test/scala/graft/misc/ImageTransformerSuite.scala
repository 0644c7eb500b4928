package graft.misc

import graft.TestBase
import graft.image._
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Golden-pixel tests for the pipelined ImageTransformer stages (ref
  * semantics: opencv/.../ImageTransformer.scala:42-220; kernels here are
  * pure JVM, borders clamped).
  */
class ImageTransformerSuite extends TestBase {

  private val imgSchema = StructType(Seq(
    StructField("id", LongType),
    StructField("image", ImageSchemaUtils.imageType)))

  /** Single-row frame holding an image struct with the given raw bytes. */
  private def imageDF(h: Int, w: Int, ch: Int, data: Array[Byte]): DataFrame = {
    val mode = if (ch == 1) 0 else ImageSchemaUtils.ocvType8UC3
    spark.createDataFrame(
      java.util.List.of(Row(1L, Row("", h, w, ch, mode, data))), imgSchema)
  }

  private def outBytes(df: DataFrame): (Int, Int, Int, Array[Byte]) = {
    val r = df.select("out.height", "out.width", "out.nChannels", "out.data").head
    (r.getInt(0), r.getInt(1), r.getInt(2), r.getAs[Array[Byte]](3))
  }

  private def b(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

  test("crop extracts the exact subregion") {
    // 3x3 gray image 10,20,...,90 row-major
    val df = imageDF(3, 3, 1, b(10, 20, 30, 40, 50, 60, 70, 80, 90))
    val t = new ImageTransformer().setInputCol("image").setOutputCol("out")
      .crop(x = 1, y = 0, height = 2, width = 2)
    val (h, w, ch, data) = outBytes(t.transform(df))
    assert((h, w, ch) == (2, 2, 1))
    assert(data.sameElements(b(20, 30, 50, 60)))
  }

  test("flip left-right, up-down, and both") {
    val df = imageDF(2, 2, 1, b(1, 2, 3, 4))
    def flipped(code: Int): Array[Byte] = outBytes(
      new ImageTransformer().setInputCol("image").setOutputCol("out")
        .flip(code).transform(df))._4
    assert(flipped(1).sameElements(b(2, 1, 4, 3)))  // left-right
    assert(flipped(0).sameElements(b(3, 4, 1, 2)))  // up-down
    assert(flipped(-1).sameElements(b(4, 3, 2, 1))) // both
  }

  test("bgr2gray uses OpenCV luma weights") {
    // one pixel: B=100, G=150, R=200 -> 0.299*200 + 0.587*150 + 0.114*100 = 159.25
    val df = imageDF(1, 1, 3, b(100, 150, 200))
    val (_, _, ch, data) = outBytes(
      new ImageTransformer().setInputCol("image").setOutputCol("out")
        .colorFormat("bgr2gray").transform(df))
    assert(ch == 1)
    assert((data(0) & 0xff) == 159)
    // and back: gray2bgr replicates the plane
    val back = outBytes(
      new ImageTransformer().setInputCol("image").setOutputCol("out")
        .colorFormat("bgr2gray").colorFormat("gray2bgr").transform(df))
    assert(back._3 == 3 && back._4.sameElements(b(159, 159, 159)))
  }

  test("threshold binary / trunc / tozero") {
    val df = imageDF(1, 4, 1, b(10, 100, 150, 250))
    def th(kind: String): Array[Byte] = outBytes(
      new ImageTransformer().setInputCol("image").setOutputCol("out")
        .threshold(128.0, 255.0, kind).transform(df))._4
    assert(th("binary").sameElements(b(0, 0, 255, 255)))
    assert(th("binary_inv").sameElements(b(255, 255, 0, 0)))
    assert(th("trunc").sameElements(b(10, 100, 128, 128)))
    assert(th("tozero").sameElements(b(0, 0, 150, 250)))
    assert(th("tozero_inv").sameElements(b(10, 100, 0, 0)))
  }

  test("box blur averages the clamped window") {
    // 3x3 with white center; 3x3 box at center = mean of all = 255/9 = 28.33 -> 28
    val data = Array.fill(9)(0.toByte); data(4) = 255.toByte
    val df = imageDF(3, 3, 1, data)
    val out = outBytes(
      new ImageTransformer().setInputCol("image").setOutputCol("out")
        .blur(3, 3).transform(df))._4
    assert((out(4) & 0xff) == 28)
    // corner window (clamped): replicated corner pixels -> 4 copies of
    // corner + ... center appears once in the 3x3 clamped window at (0,0)
    assert((out(0) & 0xff) == math.round(255.0 / 9).toInt)
  }

  test("gaussian blur: uniform stays uniform, impulse is symmetric and centered") {
    val uni = imageDF(4, 4, 1, Array.fill(16)(77.toByte))
    val uniOut = outBytes(new ImageTransformer().setInputCol("image")
      .setOutputCol("out").gaussianKernel(3, 1.0).transform(uni))._4
    assert(uniOut.forall(v => (v & 0xff) == 77))
    val imp = Array.fill(25)(0.toByte); imp(12) = 200.toByte
    val impOut = outBytes(new ImageTransformer().setInputCol("image")
      .setOutputCol("out").gaussianKernel(3, 1.0).transform(imageDF(5, 5, 1, imp)))._4
    val v = impOut.map(_ & 0xff)
    assert(v(12) > v(11) && v(11) > v(10))      // center-weighted
    assert(v(11) == v(13) && v(7) == v(17))     // symmetric
    assert(v(7) == v(11))                       // isotropic
  }

  test("resize: identity at same size, uniform upscale stays uniform") {
    val df = imageDF(2, 3, 1, b(1, 2, 3, 4, 5, 6))
    val same = outBytes(new ImageTransformer().setInputCol("image")
      .setOutputCol("out").resize(2, 3).transform(df))
    assert(same._4.sameElements(b(1, 2, 3, 4, 5, 6)))
    val uni = imageDF(2, 2, 3, Array.fill(12)(90.toByte))
    val up = outBytes(new ImageTransformer().setInputCol("image")
      .setOutputCol("out").resize(5, 7).transform(uni))
    assert((up._1, up._2, up._3) == (5, 7, 3))
    assert(up._4.forall(v => (v & 0xff) == 90))
  }

  test("stages compose in declaration order and accept binary input") {
    val img = new java.awt.image.BufferedImage(4, 4,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 4) img.setRGB(x, y, (x * 60) << 16)
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    import spark.implicits._
    val df = Seq(Tuple1(baos.toByteArray)).toDF("bytes")
    val out = new ImageTransformer().setInputCol("bytes").setOutputCol("out")
      .crop(0, 0, 4, 2).flip(1).colorFormat("bgr2gray")
      .transform(df)
    val r = out.select("out.height", "out.width", "out.nChannels").head
    assert((r.getInt(0), r.getInt(1), r.getInt(2)) == (4, 2, 1))
    // after flip, column 0 holds the former column 1 (R=60 -> gray 18)
    val data = out.select("out.data").head.getAs[Array[Byte]](0)
    assert((data(0) & 0xff) == math.round(0.299 * 60).toInt)
    assert((data(1) & 0xff) == 0)
  }

  test("copy round-trips the stage list") {
    val t = new ImageTransformer().resize(8, 8).flip(1)
    val c = t.copy(org.apache.spark.ml.param.ParamMap.empty)
    assert(c.asInstanceOf[ImageTransformer].getOrDefault(
      c.asInstanceOf[ImageTransformer].stages).toSeq == Seq("resize:8:8", "flip:1"))
  }
}
