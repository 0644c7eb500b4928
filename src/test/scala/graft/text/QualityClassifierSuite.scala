package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class QualityClassifierSuite extends TestBase {
  import spark.implicits._

  // planted separable corpus: curated docs carry a marker token
  lazy val labeled = {
    val docs = sfTable("documents").select("doc_id", "text")
    docs.withColumn("label",
        (col("doc_id") % 2 === 1).cast("double"))
      .withColumn("text",
        when(col("label") === 1.0, concat(col("text"), lit(" curatedtok")))
          .otherwise(col("text")))
  }

  test("recovers a planted separable quality rule exactly") {
    val m = new QualityClassifier().setInputCol("text").setLabelCol("label")
      .setNumBits(18).fit(labeled)
    val out = m.transform(labeled)
    val wrong = out.filter(col("quality_pred") =!= col("label").cast("long"))
      .count()
    assert(wrong == 0, s"$wrong misclassified on separable planted data")
    // probabilities are well-separated, not borderline
    val margins = out.select(
      min(when(col("label") === 1.0, col("quality_prob"))),
      max(when(col("label") === 0.0, col("quality_prob")))).head()
    assert(margins.getDouble(0) > 0.8 && margins.getDouble(1) < 0.2)
  }

  test("bigram features catch an order-sensitive rule unigrams miss") {
    // two-token docs with identical unigram bags; label = word order
    val rnd = new scala.util.Random(3)
    val rows = (0 until 400).map { i =>
      val (a, b) = (s"w${rnd.nextInt(6)}", s"v${rnd.nextInt(6)}")
      if (i % 2 == 0) (i.toLong, s"$a $b", 0.0) else (i.toLong, s"$b $a", 1.0)
    }
    val df = rows.toDF("doc_id", "text", "label")
    val m = new QualityClassifier().setInputCol("text").setLabelCol("label")
      .setNumBits(16).fit(df)
    val wrong = m.transform(df)
      .filter(col("quality_pred") =!= col("label").cast("long")).count()
    assert(wrong == 0)
  }

  test("paretoKeep: score 1 always survives, score 0 survives rarely") {
    val scored = (0 until 2000).map(i => (i.toLong, if (i < 1000) 1.0 else 0.0))
      .toDF("doc_id", "score")
    val kept = scored.filter(QualityClassifier.paretoKeep(
        col("score"), col("doc_id"), alpha = 9.0, salt = "p"))
      .groupBy("score").count().as[(Double, Long)].collect().toMap
    assert(kept(1.0) == 1000L, "score 1: pareto draw > 0 always")
    // score 0 needs a draw > 1: P = (1+1)^-9 ~ 0.2%
    assert(kept.getOrElse(0.0, 0L) < 30L)
    // deterministic: the same salt re-decides identically
    val again = scored.filter(QualityClassifier.paretoKeep(
      col("score"), col("doc_id"), 9.0, "p")).count()
    assert(again == kept.values.sum)
  }

  test("model save/load scores identically") {
    val m = new QualityClassifier().setInputCol("text").setLabelCol("label")
      .setNumBits(16).setMaxIter(20).fit(labeled)
    val dir = java.nio.file.Files.createTempDirectory("qc").toString + "/m"
    m.write.overwrite().save(dir)
    val loaded = QualityClassifierModel.load(dir)
    assertDFEq(
      m.transform(labeled).select("doc_id", "quality_pred"),
      loaded.transform(labeled).select("doc_id", "quality_pred"))
  }
}
