package graft.anomaly

import graft.core._
import org.apache.spark.ml.{Estimator, Model}
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Isolation forest (Liu/Ting/Zhou 2008), the build-not-buy decision of
  * SURVEY §2.13 (the reference wraps com.linkedin.isolation-forest;
  * offline we re-implement the ~300-line algorithm).
  *
  * Scale design: each tree trains on a ≤`subsampleSize` seeded sample —
  * the driver collects only numTrees × subsampleSize rows (bounded,
  * independent of table size); the fitted forest broadcasts and scoring
  * is a stateless per-row map, no shuffle.
  */
object IsolationForest extends graft.core.GraftReadable[IsolationForest] {
  sealed trait ITree extends Serializable
  case class Leaf(size: Int) extends ITree
  case class Split(feature: Int, threshold: Double,
                   left: ITree, right: ITree) extends ITree

  def buildTree(data: Array[Array[Double]], heightLimit: Int,
                rng: scala.util.Random): ITree = {
    if (data.length <= 1 || heightLimit <= 0) Leaf(data.length)
    else {
      val dim = data(0).length
      // pick among features with spread
      val candidates = (0 until dim).filter { f =>
        var lo = data(0)(f); var hi = data(0)(f)
        data.foreach { r => if (r(f) < lo) lo = r(f); if (r(f) > hi) hi = r(f) }
        hi > lo
      }
      if (candidates.isEmpty) Leaf(data.length)
      else {
        val f = candidates(rng.nextInt(candidates.length))
        var lo = data(0)(f); var hi = data(0)(f)
        data.foreach { r => if (r(f) < lo) lo = r(f); if (r(f) > hi) hi = r(f) }
        val t = lo + rng.nextDouble() * (hi - lo)
        val (l, r) = data.partition(_(f) < t)
        Split(f, t, buildTree(l, heightLimit - 1, rng),
          buildTree(r, heightLimit - 1, rng))
      }
    }
  }

  /** Average path length of an unsuccessful BST search in n nodes. */
  def c(n: Int): Double =
    if (n <= 1) 0.0
    else 2.0 * (math.log(n - 1) + 0.5772156649) - 2.0 * (n - 1.0) / n

  def pathLength(x: Array[Double], tree: ITree, depth: Int = 0): Double =
    tree match {
      case Leaf(size) => depth + c(size)
      case Split(f, t, l, r) =>
        if (x(f) < t) pathLength(x, l, depth + 1)
        else pathLength(x, r, depth + 1)
    }
}

class IsolationForest(override val uid: String)
    extends Estimator[IsolationForestModel] with HasInputCols with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("IsolationForest"))

  final val numTrees = new IntParam(this, "numTrees", "", ParamValidators.gt(0))
  setDefault(numTrees -> 100)
  def setNumTrees(v: Int): this.type = set(numTrees, v)
  final val subsampleSize = new IntParam(this, "subsampleSize", "rows per tree")
  setDefault(subsampleSize -> 256)
  def setSubsampleSize(v: Int): this.type = set(subsampleSize, v)
  final val seed = new LongParam(this, "seed", "")
  setDefault(seed -> 42L)
  def setSeed(v: Long): this.type = set(seed, v)

  override def fit(ds: Dataset[_]): IsolationForestModel = {
    import IsolationForest._
    val df = ds.toDF()
    val feats = $(inputCols).toSeq
    val n = df.count()
    val need = $(numTrees).toLong * $(subsampleSize)
    // one bounded seeded sample feeds every tree (driver memory is
    // O(numTrees * subsampleSize), independent of table size)
    val frac = math.min(1.0, need * 1.2 / math.max(n, 1L))
    val sample = df.select(feats.map(c => col(c).cast("double")): _*)
      .na.drop()
      .sample(withReplacement = false, frac, $(seed))
      .limit(need.toInt).collect()
      .map(r => Array.tabulate(feats.length)(r.getDouble))
    val rng = new scala.util.Random($(seed))
    val perTree = math.min($(subsampleSize), math.max(sample.length, 1))
    val hLimit = math.ceil(math.log(perTree.toDouble) / math.log(2)).toInt
    val trees = Array.fill($(numTrees)) {
      val sub = Array.fill(perTree)(sample(rng.nextInt(sample.length)))
      buildTree(sub, hLimit, rng)
    }
    val m = new IsolationForestModel(uid + "_model")
    m.set(m.inputCols, $(inputCols))
    m.trees = df.sparkSession.sparkContext.broadcast(trees)
    m.subsample = perTree
    m
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField("anomaly_score", DoubleType))
  override def copy(extra: ParamMap): IsolationForest = defaultCopy(extra)
}

class IsolationForestModel(override val uid: String)
    extends Model[IsolationForestModel] with HasInputCols
    with org.apache.spark.ml.util.MLWritable {
  def this() = this(Identifiable.randomUID("IsolationForestModel"))

  var trees: org.apache.spark.broadcast.Broadcast[Array[IsolationForest.ITree]] = _
  var subsample: Int = 256

  override def write: org.apache.spark.ml.util.MLWriter =
    new org.apache.spark.ml.util.MLWriter {
      override protected def saveImpl(path: String): Unit = {
        org.apache.spark.ml.graftshims.PipelineMetadataShim
          .save(IsolationForestModel.this, path, sparkSession)
        graft.core.ModelIO.writeText(sparkSession, s"$path/params.json",
          graft.core.ModelIO.paramsJson(IsolationForestModel.this))
        graft.core.ModelIO.writeText(sparkSession, s"$path/subsample.txt",
          subsample.toString)
        graft.core.ModelIO.writeObject(sparkSession, s"$path/trees.bin",
          trees.value)
      }
    }

  final val outputCol = new Param[String](this, "outputCol", "score column")
  setDefault(outputCol -> "anomaly_score")
  def setOutputCol(v: String): this.type = set(outputCol, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    import IsolationForest._
    val bc = trees
    val cn = c(subsample)
    val score = udf { (r: org.apache.spark.sql.Row) =>
      val x = Array.tabulate(r.length)(i => r.get(i) match {
        case null => 0.0
        case n: Number => n.doubleValue()
      })
      val ts = bc.value
      var s = 0.0
      ts.foreach(t => s += pathLength(x, t))
      val eh = s / ts.length
      math.pow(2.0, -eh / cn) // ~1 = anomaly, ~0.5 = normal
    }
    val df = ds.toDF()
    df.withColumn($(outputCol),
      score(struct($(inputCols).map(col).toIndexedSeq: _*)))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField($(outputCol), DoubleType))
  override def copy(extra: ParamMap): IsolationForestModel = {
    val m = new IsolationForestModel(uid)
    m.trees = trees; m.subsample = subsample
    copyValues(m, extra)
  }
}

object IsolationForestModel
    extends org.apache.spark.ml.util.MLReadable[IsolationForestModel] {
  override def read: org.apache.spark.ml.util.MLReader[IsolationForestModel] =
    new org.apache.spark.ml.util.MLReader[IsolationForestModel] {
      override def load(path: String): IsolationForestModel = {
        val m = new IsolationForestModel()
        graft.core.ModelIO.setParamsFromJson(m,
          graft.core.ModelIO.readText(sparkSession, s"$path/params.json"))
        m.subsample = graft.core.ModelIO
          .readText(sparkSession, s"$path/subsample.txt").trim.toInt
        m.trees = sparkSession.sparkContext.broadcast(graft.core.ModelIO
          .readObject[Array[IsolationForest.ITree]](sparkSession, s"$path/trees.bin"))
        m
      }
    }
}
