package graft.nn

import graft.TestBase
import org.apache.spark.sql.functions._

class MLPScorerSuite extends TestBase {
  import spark.implicits._

  private def scorer(ls: Seq[DenseLayer]) =
    new MLPScorer().setInputCol("emb").setOutputCol("score").setLayers(ls)

  test("two-layer head matches the hand-computed forward pass") {
    // hidden = relu(W1 x + b1), score = V . hidden + c
    val w1 = Array(Array(1.0, -1.0), Array(0.5, 0.5))
    val b1 = Array(0.0, -0.25)
    val v = Array(Array(2.0, 4.0))
    val c = Array(0.125)
    val docs = Seq(
      (1L, Seq(1.0, 0.5)),   // h = (0.5, 0.5) -> 0.125 + 1 + 2 = 3.125
      (2L, Seq(-1.0, 1.0)),  // h = relu(-2, -0.25) = (0,0) -> 0.125
      (3L, Seq(0.0, 0.0)))   // h = (0, relu(-0.25)=0) -> 0.125
      .toDF("doc_id", "emb")
    val got = scorer(Seq(DenseLayer(w1, b1), DenseLayer(v, c)))
      .transform(docs)
      .select("doc_id", "score").as[(Long, Double)].collect().toMap
    assert(got(1L) == 3.125 && got(2L) == 0.125 && got(3L) == 0.125)
  }

  test("single linear layer, sigmoid output, float input, null handling") {
    val l = Seq(DenseLayer(Array(Array(1.0, 1.0)), Array(0.0)))
    val docs = Seq(
      (1L, Seq(0.25f, -0.25f)),
      (2L, null.asInstanceOf[Seq[Float]]))
      .toDF("doc_id", "emb")
    val lin = scorer(l).transform(docs)
      .select("doc_id", "score").as[(Long, Option[Double])].collect().toMap
    assert(lin(1L).contains(0.0) && lin(2L).isEmpty)
    val sig = scorer(l).setOutputActivation("sigmoid").transform(docs)
      .select("doc_id", "score").as[(Long, Option[Double])].collect().toMap
    assert(sig(1L).contains(0.5) && sig(2L).isEmpty)
    // a single-layer head gets NO relu (it is the output layer):
    // negative logits pass through
    val neg = scorer(l).transform(
        Seq((9L, Seq(-1.0, 0.0))).toDF("doc_id", "emb"))
      .select("score").as[Double].head()
    assert(neg == -1.0)
  }

  test("dimension chains and wrong-length embeddings fail fast") {
    val e1 = intercept[IllegalArgumentException] {
      scorer(Seq(
        DenseLayer(Array(Array(1.0, 1.0)), Array(0.0)),
        DenseLayer(Array(Array(1.0, 1.0)), Array(0.0)))) // 2-in after 1-unit
    }
    assert(e1.getMessage.contains("previous units"))
    val e2 = intercept[IllegalArgumentException] {
      scorer(Seq(DenseLayer(Array(Array(1.0), Array(2.0)),
        Array(0.0, 0.0)))) // last layer must emit one value
    }
    assert(e2.getMessage.contains("one value"))
    val bad = scorer(Seq(DenseLayer(Array(Array(1.0, 1.0)), Array(0.0))))
      .transform(Seq((1L, Seq(1.0, 2.0, 3.0))).toDF("doc_id", "emb"))
    val e3 = intercept[Exception] { bad.collect() }
    assert(e3.getMessage.contains("head input dim") ||
      Option(e3.getCause).exists(_.getMessage.contains("head input dim")))
    // transform without layers fails before any job
    val e4 = intercept[IllegalArgumentException] {
      new MLPScorer().setInputCol("emb")
        .transform(Seq((1L, Seq(1.0))).toDF("doc_id", "emb"))
    }
    assert(e4.getMessage.contains("setLayers"))
    // non-finite weights fail at construction, not after a full pass
    val e5 = intercept[IllegalArgumentException] {
      DenseLayer(Array(Array(Double.NaN)), Array(0.0))
    }
    assert(e5.getMessage.contains("finite"))
  }

  test("plans as a narrow zero-exchange projection") {
    val docs = (0L until 100L).map(i => (i, Seq(i.toDouble, 1.0)))
      .toDF("doc_id", "emb")
    val plan = scorer(Seq(DenseLayer(Array(Array(1.0, 1.0)), Array(0.0))))
      .transform(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("embeddings with a null ELEMENT score null, like null embeddings") {
    val docs = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0)),
      (2L, Seq[java.lang.Double](1.0, null)),
      (3L, null.asInstanceOf[Seq[java.lang.Double]]))
      .toDF("doc_id", "emb")
    val got = scorer(Seq(DenseLayer(Array(Array(1.0, 1.0)), Array(0.0))))
      .transform(docs)
      .select("doc_id", "score").as[(Long, Option[Double])].collect().toMap
    assert(got(1L).contains(3.0) && got(2L).isEmpty && got(3L).isEmpty)
  }

  test("transformSchema fails on an output-column clash") {
    val e = intercept[IllegalArgumentException] {
      scorer(Seq(DenseLayer(Array(Array(1.0)), Array(0.0))))
        .setOutputCol("emb")
        .transformSchema(Seq((1L, Seq(1.0))).toDF("doc_id", "emb").schema)
    }
    assert(e.getMessage.contains("already has a column"))
  }

  test("save/load round-trips the head: a reloaded scorer still scores") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft_mlp_io").toString + "/head"
    val w1 = Array(Array(1.0, -1.0), Array(0.5, 0.5))
    val orig = scorer(Seq(DenseLayer(w1, Array(0.0, -0.25)),
        DenseLayer(Array(Array(2.0, 4.0)), Array(0.125))))
      .setOutputActivation("sigmoid")
    orig.write.overwrite().save(dir)
    val back = MLPScorer.load(dir)
    assert(back.get(back.outputActivation).contains("sigmoid"))
    val docs = Seq((1L, Seq(1.0, 0.5)), (2L, Seq(-1.0, 1.0)))
      .toDF("doc_id", "emb")
    val a = orig.transform(docs).select("doc_id", "score")
      .as[(Long, Double)].collect().toMap
    val b = back.transform(docs).select("doc_id", "score")
      .as[(Long, Double)].collect().toMap
    assert(a == b && a(1L) > 0.9)
  }
}
