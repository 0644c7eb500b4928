package graft.automl

import graft.TestBase
import org.apache.spark.ml.classification.{DecisionTreeClassifier, LogisticRegression}
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.ml.Pipeline
import org.apache.spark.sql.functions._

class AutoMLSuite extends TestBase {
  import spark.implicits._

  // separable data: label = 1 iff f1 > 5
  private def data = {
    val rnd = new scala.util.Random(3)
    (0 until 200).map { i =>
      val f1 = rnd.nextDouble() * 10
      (i.toLong, f1, rnd.nextDouble(), if (f1 > 5) 1.0 else 0.0)
    }.toDF("id", "f1", "f2", "label")
  }

  private def pipelineFor(maxDepth: Int) = {
    val va = new VectorAssembler().setInputCols(Array("f1", "f2"))
      .setOutputCol("features")
    val dt = new DecisionTreeClassifier().setMaxDepth(maxDepth)
    new Pipeline().setStages(Array(va, dt))
  }

  test("HyperparamBuilder draws reproducible random grids") {
    val lr = new LogisticRegression()
    val b = new HyperparamBuilder()
      .addHyperparam(lr.regParam, RangeHyperParam(0.0, 1.0))
      .addHyperparam(lr.maxIter, DiscreteHyperParam(Seq(5, 10)))
    val g1 = b.build(5, seed = 9)
    val g2 = b.build(5, seed = 9)
    assert(g1.map(_.toString).sameElements(g2.map(_.toString)))
    assert(g1.forall { pm =>
      val rp = pm(lr.regParam); rp >= 0.0 && rp <= 1.0
    })
  }

  test("TuneHyperparameters finds a good model across estimators") {
    val va = new VectorAssembler().setInputCols(Array("f1", "f2"))
      .setOutputCol("features")
    val dt = new DecisionTreeClassifier()
    val dtGrid = new HyperparamBuilder()
      .addHyperparam(dt.maxDepth, DiscreteHyperParam(Seq(1, 3, 5))).build(3, 5)
    val lr = new LogisticRegression()
    val lrGrid = new HyperparamBuilder()
      .addHyperparam(lr.regParam, RangeHyperParam(0.0, 0.1)).build(2, 5)
    val candidates = Seq(
      ("dt", new Pipeline().setStages(Array(va, dt)), dtGrid),
      ("lr", new Pipeline().setStages(Array(va, lr)), lrGrid))
    val tuned = new TuneHyperparameters(
      candidates, Evaluators.accuracy("label", "prediction"),
      numFolds = 2, parallelism = 4).fit(data)
    assert(tuned.bestMetric > 0.9)
    // results frame: one row per (candidate, grid, fold)
    assert(tuned.results.count() == (3 + 2) * 2)
    // refit best model scores well on the full frame
    val acc = Evaluators.accuracy("label", "prediction")(
      tuned.bestModel.transform(data))
    assert(acc > 0.95)
  }

  test("FindBestModel picks the higher-accuracy model") {
    val good = pipelineFor(5).fit(data)
    val bad = pipelineFor(1).fit(data)
    val (best, metrics) = new FindBestModel(
      Seq(("good", good), ("bad", bad)),
      Evaluators.accuracy("label", "prediction")).fit(data)
    val m = metrics.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("good") >= m("bad"))
    assert(best eq good)
  }
}
