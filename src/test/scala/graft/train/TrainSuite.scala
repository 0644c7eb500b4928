package graft.train

import graft.TestBase
import graft.featurize._
import org.apache.spark.sql.functions._

class TrainSuite extends TestBase {
  import spark.implicits._

  // separable toy data: label = x > 0
  lazy val toy = {
    val rnd = new scala.util.Random(11)
    (1 to 400).map { _ =>
      val x = rnd.nextGaussian()
      val y = rnd.nextGaussian()
      (x, y, if (x > 0) "pos" else "neg")
    }.toDF("x", "y", "lab")
  }

  test("TrainClassifier learns a separable boundary") {
    val model = new TrainClassifier().setLabelCol("lab")
      .setFeatureCols(Seq("x", "y")).setLearner("LogisticRegression").fit(toy)
    val scored = model.transform(toy)
    assert(scored.columns.contains("predicted_label"))
    val acc = scored.filter(col("predicted_label") === col("lab")).count()
      .toDouble / scored.count()
    assert(acc > 0.95, s"accuracy $acc")
  }

  test("ComputeModelStatistics classification metrics") {
    val model = new TrainClassifier().setLabelCol("lab")
      .setFeatureCols(Seq("x", "y")).setLearner("LogisticRegression").fit(toy)
    val indexed = new ValueIndexer().setInputCol("lab").setOutputCol("li")
      .fit(toy).transform(model.transform(toy))
    val stats = new ComputeModelStatistics().setLabelCol("li")
      .setEvaluationMetric("classification")
      .setScoredProbabilitiesCol("probability")
      .transform(indexed)
    val row = stats.head
    assert(row.getAs[Double]("accuracy") > 0.95)
    assert(row.getAs[Double]("AUC") > 0.95)
  }

  test("TrainRegressor + regression stats + per-instance stats") {
    val data = (1 to 300).map { i =>
      val x = i / 100.0; (x, 3.0 * x + 1.0)
    }.toDF("x", "target")
    val model: TrainedRegressorModel = new TrainRegressor().setLabelCol("target")
      .setFeatureCols(Seq("x")).setLearner("LinearRegression").fit(data)
    val scored = model.transform(data)
    val stats = new ComputeModelStatistics().setLabelCol("target")
      .setEvaluationMetric("regression").transform(scored)
    assert(stats.head.getAs[Double]("rmse") < 0.01)
    val per = new ComputePerInstanceStatistics().setLabelCol("target")
      .setEvaluationMetric("regression").transform(scored)
    assert(per.agg(max("L1_loss")).head.getDouble(0) < 0.01)
  }

  test("Featurize handles numeric, string, and timestamp columns") {
    val df = Seq(
      (1.0, "hello world", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")),
      (2.0, "foo bar", java.sql.Timestamp.valueOf("2024-06-15 12:00:00"))
    ).toDF("num", "txt", "ts")
    val m = new Featurize().setInputCols(Seq("num", "txt", "ts"))
      .setNumFeatures(64).fit(df)
    val out = m.transform(df)
    val v = out.select("features").head
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    // exact layout golden (the reference commits featurize-schema JSONs —
    // benchmark{BasicDataTypes,Date,String}.json — for the same purpose):
    // 1 numeric slot + 64 hashed text slots + 8 timestamp features
    assert(v.size == 1 + 64 + 8, s"featurized layout changed: ${v.size}")
    // 2024-01-01 00:00:00 UTC: reference component order/units
    // [epochMs, year, isoDow(Mon=1), month, day, hour, min, sec]
    val ts = v.toArray.takeRight(8)
    assert(ts.sameElements(
      Array(1704067200000.0, 2024.0, 1.0, 1.0, 1.0, 0.0, 0.0, 0.0)),
      s"timestamp components changed: ${ts.mkString(",")}")
  }

  test("Featurize null-fills string columns like the reference") {
    val df = Seq((1.0, "hello"), (2.0, null: String)).toDF("num", "txt")
    val m = new Featurize().setInputCols(Seq("num", "txt"))
      .setNumFeatures(16).fit(df)
    val vs = m.transform(df).select("features").collect()
      .map(_.getAs[org.apache.spark.ml.linalg.Vector](0))
    assert(vs.forall(v => !v.toArray.exists(_.isNaN)),
      "null string row produced NaN features")
    assert(vs.forall(_.size == 1 + 16))
  }

  test("Featurize date column gets the 5-component reference layout") {
    val df = Seq(
      (1L, java.sql.Date.valueOf("2024-06-16")), // a Sunday: isoDow 7
      (2L, java.sql.Date.valueOf("2024-06-15"))
    ).toDF("id", "d")
    val m = new Featurize().setInputCols(Seq("d")).setOutputCol("f").fit(df)
    val v = m.transform(df).orderBy("id").select("f").head
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(v.toArray.sameElements(
      Array(1718496000000.0, 2024.0, 7.0, 6.0, 16.0)),
      s"date components changed: ${v.toArray.mkString(",")}")
  }

  test("TextFeaturizer TF-IDF end-to-end") {
    val df = Seq("spark is fast", "spark is distributed", "ducks are birds")
      .toDF("text")
    val m = new TextFeaturizer().setInputCol("text").setOutputCol("f")
      .setNumFeatures(1 << 10).fit(df)
    val out = m.transform(df)
    assert(out.select("f").collect().forall(
      _.getAs[org.apache.spark.ml.linalg.Vector](0).numNonzeros > 0))
    assert(!out.columns.exists(_.startsWith("__tf_")))
  }

  test("CountSelector drops all-zero slots") {
    import org.apache.spark.ml.linalg.Vectors
    val df = Seq(
      Vectors.sparse(10, Seq((1, 1.0), (3, 2.0))),
      Vectors.sparse(10, Seq((3, 1.0), (7, 5.0)))
    ).map(Tuple1.apply).toDF("vec")
    val m = new CountSelector().setInputCol("vec").setOutputCol("out").fit(df)
    assert(m.indices.sameElements(Array(1, 3, 7)))
    val out = m.transform(df).select("out").head
      .getAs[org.apache.spark.ml.linalg.Vector](0)
    assert(out.size == 3)
  }
}
