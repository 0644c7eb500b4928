package graft.sim

import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.core._

/** SQ8 scalar quantization of embedding columns — the storage-side
  * companion to the ANN family (FAISS `SQ8`): each dimension is
  * affinely mapped to a uint8 code against per-dimension corpus
  * min/max, an exact 4x shrink of a float32 vector store (at 10^10
  * 768-dim vectors: 30 TB → 7.5 TB) at a recall cost the suite
  * measures. Compose: store codes + train-time bounds, dequantize on
  * scan for candidate generation, exact re-rank against the original
  * floats for the final k (the IVFPQ recipe, one codebook simpler).
  *
  * fit is ONE narrow aggregation: (dim, value) pairs from an index
  * explode, min/max per dim with map-side combine, `dim` rows collect
  * (the only driver state — 2·dim doubles). transform is a codegen'd
  * per-row expression against the broadcast bounds: code_i =
  * floor((x_i − min_i)·255/(max_i − min_i) + 0.5) — floor(+0.5), not
  * round(), because both engines define floor identically while
  * round's tie rule differs, and the whole arithmetic chain is
  * replayed double-for-double by the DuckDB oracle (float→double
  * widening is exact, the knn-oracle precedent). A zero-range
  * dimension encodes to 0.
  */
class ScalarQuantizer(override val uid: String)
    extends Estimator[ScalarQuantizerModel] with HasInputCol
    with GraftWritable {
  def this() = this(Identifiable.randomUID("ScalarQuantizer"))

  override def fit(ds: Dataset[_]): ScalarQuantizerModel = {
    val df = ds.toDF()
    val stats = df
      .select(posexplode(col(getInputCol).cast(ArrayType(DoubleType)))
        .as(Seq("__pos", "__x")))
      .groupBy("__pos")
      .agg(min(col("__x")).as("mn"), max(col("__x")).as("mx"))
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
      .sortBy(_._1)
    require(stats.nonEmpty, "empty corpus or all-null embeddings")
    require(stats.map(_._1).toSeq == stats.indices.toSeq,
      "ragged embedding dimensions")
    val m = new ScalarQuantizerModel(uid)
    copyValues(m)
    m.mins = stats.map(_._2)
    m.maxs = stats.map(_._3)
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField("codes", ArrayType(IntegerType)))
  override def copy(extra: ParamMap): ScalarQuantizer = defaultCopy(extra)
}
object ScalarQuantizer extends GraftReadable[ScalarQuantizer]

class ScalarQuantizerModel(override val uid: String)
    extends Model[ScalarQuantizerModel] with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("ScalarQuantizerModel"))
  setDefault(outputCol -> "codes")

  var mins: Array[Double] = _
  var maxs: Array[Double] = _

  override def transform(ds: Dataset[_]): DataFrame = {
    val mnLit = lit(mins)
    val rangeLit = lit(mins.indices.map(i => maxs(i) - mins(i)).toArray)
    val codes = transform_(col(getInputCol).cast(ArrayType(DoubleType)),
      (x, i) => {
        val mn = element_at(mnLit, i + 1)
        val rg = element_at(rangeLit, i + 1)
        when(rg === 0.0, 0).otherwise(
          least(lit(255.0), greatest(lit(0.0),
            floor((x - mn) * lit(255.0) / rg + lit(0.5)))).cast(IntegerType))
      })
    ds.toDF().withColumn($(outputCol), codes)
  }

  /** Approximate reconstruction: min_i + code_i·range_i/255 (the cell
    * midpoint convention is deliberately NOT used — this inverse is
    * exact at both range ends, which keeps roundtrip tests crisp). */
  def dequantize(c: Column): Column = {
    val mnLit = lit(mins)
    val rangeLit = lit(mins.indices.map(i => maxs(i) - mins(i)).toArray)
    transform_(c, (code, i) =>
      element_at(mnLit, i + 1) +
        code.cast(DoubleType) * element_at(rangeLit, i + 1) / lit(255.0))
  }

  private def transform_(c: Column, f: (Column, Column) => Column): Column =
    org.apache.spark.sql.functions.transform(c, f)

  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), ArrayType(IntegerType)))
  override def copy(extra: ParamMap): ScalarQuantizerModel = {
    val m = defaultCopy[ScalarQuantizerModel](extra)
    m.mins = mins; m.maxs = maxs; m
  }

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(ScalarQuantizerModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(ScalarQuantizerModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/bounds.bin",
          (mins, maxs))
      }
    }
}
object ScalarQuantizerModel
    extends org.apache.spark.ml.util.MLReadable[ScalarQuantizerModel] {
  override def read: org.apache.spark.ml.util.MLReader[ScalarQuantizerModel] =
    new org.apache.spark.ml.util.MLReader[ScalarQuantizerModel] {
      override def load(path: String): ScalarQuantizerModel = {
        val m = new ScalarQuantizerModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        val (mn, mx) = graft.core.ModelIO
          .readObject[(Array[Double], Array[Double])](
            sparkSession, s"$path/bounds.bin")
        m.mins = mn; m.maxs = mx
        m
      }
    }
}
