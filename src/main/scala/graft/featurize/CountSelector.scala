package graft.featurize

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.feature.VectorSlicer
import org.apache.spark.ml.linalg.{SparseVector, DenseVector, Vector => MLVector}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Drops vector slots that are zero everywhere (ref:
  * featurize/CountSelector.scala:33-52,74-82 — BitSet union reduce).
  * Implemented as an RDD `treeAggregate` over per-partition bitsets —
  * map-side combining, one small result to the driver. Model = VectorSlicer
  * on the surviving indices.
  */
class CountSelector(override val uid: String)
    extends Estimator[CountSelectorModel] with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("CountSelector"))
  setDefault(outputCol -> "selected")

  override def fit(ds: Dataset[_]): CountSelectorModel = {
    val in = getInputCol
    val nonZero = ds.toDF().select(col(in)).rdd
      .treeAggregate(new java.util.BitSet())(
        seqOp = (bs, row) => {
          row.getAs[MLVector](0) match {
            case s: SparseVector =>
              var i = 0
              while (i < s.indices.length) {
                if (s.values(i) != 0.0) bs.set(s.indices(i)); i += 1
              }
            case d: DenseVector =>
              var i = 0
              while (i < d.values.length) {
                if (d.values(i) != 0.0) bs.set(i); i += 1
              }
          }
          bs
        },
        combOp = (a, b) => { a.or(b); a })
    val indices = nonZero.stream().toArray
    val m = new CountSelectorModel(uid + "_model")
      .setInputCol(in).setOutputCol(getOutputCol)
    m.indices = indices
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): CountSelector = defaultCopy(extra)
}
object CountSelector extends graft.core.GraftReadable[CountSelector]


class CountSelectorModel(override val uid: String)
    extends Model[CountSelectorModel] with HasInputCol with HasOutputCol
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("CountSelectorModel"))

  var indices: Array[Int] = Array.empty

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(CountSelectorModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(CountSelectorModel.this))
        graft.core.ModelIO.writeObject(sparkSession, s"$path/indices.bin", indices)
      }
    }

  override def transform(ds: Dataset[_]): DataFrame =
    new VectorSlicer().setInputCol(getInputCol).setOutputCol(getOutputCol)
      .setIndices(indices).transform(ds.toDF())
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol,
      org.apache.spark.ml.linalg.SQLDataTypes.VectorType))
  override def copy(extra: ParamMap): CountSelectorModel = {
    val c = new CountSelectorModel(uid); c.indices = indices
    copyValues(c, extra)
  }
}

object CountSelectorModel
    extends org.apache.spark.ml.util.MLReadable[CountSelectorModel] {
  override def read: org.apache.spark.ml.util.MLReader[CountSelectorModel] =
    new org.apache.spark.ml.util.MLReader[CountSelectorModel] {
      override def load(path: String): CountSelectorModel = {
        val m = new CountSelectorModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.indices = graft.core.ModelIO
          .readObject[Array[Int]](sparkSession, s"$path/indices.bin")
        m
      }
    }
}
