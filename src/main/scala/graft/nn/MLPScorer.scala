package graft.nn

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** A dense feed-forward layer: `w` is units × inputs, `b` is units. */
case class DenseLayer(w: Array[Array[Double]], b: Array[Double]) {
  require(w.nonEmpty && w.forall(_.length == w.head.length),
    "layer weight rows must be non-empty and equal-length")
  require(b.length == w.length,
    s"bias length ${b.length} != ${w.length} units")
  require(w.forall(_.forall(java.lang.Double.isFinite)) &&
    b.forall(java.lang.Double.isFinite),
    "layer weights and biases must be finite (a NaN/Inf head scores " +
      "every document NaN — fail at construction, not after a full pass)")
  def inputDim: Int = w.head.length
  def units: Int = w.length
}

/** Score a small dense feed-forward head over a precomputed embedding
  * column — the quality-classifier / reward-head pattern (FineWeb-Edu's
  * regression head over page embeddings; the filtering score most
  * modern web recipes gate on) run natively, without a DNN runtime.
  *
  * This is the dense-head slice of the reference's DNN-scoring surface
  * (CNTKModel — `/root/reference/deep-learning/src/main/scala/com/
  * microsoft/ml/spark/cntk/CNTKModel.scala:89-130` scores arbitrary
  * graphs through a native runtime; no such runtime ships offline,
  * SURVEY §7). Backbone inference stays out of scope;
  * what a 100 TB curation pass actually re-runs per candidate corpus is
  * exactly this head — embeddings are computed once upstream, heads are
  * retrained and re-applied per experiment.
  *
  * Weights live in a complex Param, so they PERSIST with the stage
  * through [[graft.core.GraftWritable]]'s `complex.bin` (the
  * reference's ComplexParams pattern — `/root/reference/core/src/main/
  * scala/org/apache/spark/ml/param/DataFrameParam.scala:1-142` exists
  * precisely so fitted/complex state survives save/load; a head is a
  * few KB of doubles, far below any payload concern) and are broadcast
  * ONCE per transform; the kernel is a per-row loop over layers (ReLU
  * between layers, configurable output activation). Scale shape: narrow
  * map-only projection, zero shuffle, broadcast = the head's own few
  * KB-MB. Null embeddings — and embeddings containing a null ELEMENT,
  * which carry no scoreable vector either — score null; a wrong-length
  * embedding fails fast with the expected/actual dims.
  */
class MLPScorer(override val uid: String)
    extends Transformer with HasInputCol with GraftWritable {
  def this() = this(Identifiable.randomUID("MLPScorer"))

  final val outputCol = new Param[String](this, "outputCol",
    "score output column")
  setDefault(outputCol -> "mlp_score")
  def setOutputCol(v: String): this.type = set(outputCol, v)

  final val outputActivation = new Param[String](this, "outputActivation",
    "activation on the LAST layer: linear (regression head) or sigmoid " +
      "(probability head); hidden layers are always ReLU",
    ParamValidators.inArray(Array("linear", "sigmoid")))
  setDefault(outputActivation -> "linear")
  def setOutputActivation(v: String): this.type = set(outputActivation, v)

  /** The head's weights as a complex Param (Java-serialized into
    * `complex.bin` by [[graft.core.GraftWriter]]), so a saved pipeline
    * reloads a scorer that still scores — round-15 shipped this as
    * transient runtime state and a reloaded head failed fast instead. */
  final val layers = new Param[Seq[DenseLayer]](this, "layers",
    "the head's dense layers, first to last")

  /** The head's layers, first to last; each layer's inputDim must equal
    * the previous layer's units (the first, the embedding dim); the
    * last layer must have exactly one unit. */
  def setLayers(ls: Seq[DenseLayer]): this.type = {
    require(ls.nonEmpty, "at least one layer")
    ls.sliding(2).foreach {
      case Seq(a, b) =>
        require(b.inputDim == a.units,
          s"layer input dim ${b.inputDim} != previous units ${a.units}")
      case _ => ()
    }
    require(ls.last.units == 1,
      s"last layer has ${ls.last.units} units; a scorer emits one value")
    // toList: a concrete immutable, Java-serializable realization (the
    // caller may hand us a lazy or array-backed wrapper)
    set(layers, ls.toList)
  }

  override def transform(ds: Dataset[_]): DataFrame = {
    require(isSet(layers) && $(layers).nonEmpty,
      "call setLayers before transform")
    val ls = $(layers)
    val sigmoid = $(outputActivation) == "sigmoid"
    val bls = ds.sparkSession.sparkContext.broadcast(ls)
    // boxed elements: an array with a null ELEMENT carries no scoreable
    // vector either — it scores null like a null embedding (a primitive
    // Seq[Double] would NPE opaquely at unboxing instead)
    val scoreUdf = udf { x: Seq[java.lang.Double] =>
      if (x == null || x.exists(_ eq null)) null
      else {
        val lsv = bls.value
        require(x.length == lsv.head.inputDim,
          s"embedding length ${x.length} != head input dim " +
            s"${lsv.head.inputDim}")
        val cur0 = new Array[Double](x.length)
        var xi = 0
        while (xi < cur0.length) { cur0(xi) = x(xi).doubleValue; xi += 1 }
        var cur = cur0
        var li = 0
        while (li < lsv.length) {
          val l = lsv(li)
          val out = new Array[Double](l.units)
          var i = 0
          while (i < l.units) {
            val w = l.w(i)
            var s = l.b(i)
            var j = 0
            while (j < w.length) { s += w(j) * cur(j); j += 1 }
            // ReLU between layers; the last layer stays linear here and
            // the output activation applies below
            out(i) = if (li < lsv.length - 1 && s < 0.0) 0.0 else s
            i += 1
          }
          cur = out
          li += 1
        }
        val z = cur(0)
        java.lang.Double.valueOf(
          if (sigmoid) 1.0 / (1.0 + math.exp(-z)) else z)
      }
    }
    ds.toDF().withColumn($(outputCol),
      scoreUdf(col(getInputCol).cast(ArrayType(DoubleType))))
  }

  override def transformSchema(schema: StructType): StructType = {
    // the round-15 convention (DeterministicSplitter/DomainUpsampler): a
    // same-named input column would be silently overwritten at transform
    // — fail at pipeline validation instead
    require(!schema.fieldNames.contains($(outputCol)),
      s"input already has a column named '${$(outputCol)}'")
    StructType(schema :+ StructField($(outputCol), DoubleType))
  }
  override def copy(extra: ParamMap): MLPScorer = defaultCopy(extra)
}
object MLPScorer extends GraftReadable[MLPScorer]
