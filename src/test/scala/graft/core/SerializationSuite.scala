package graft.core

import graft.TestBase
import graft.anomaly.{IsolationForest, IsolationForestModel}
import graft.featurize._
import graft.nn.{KNN, KNNModel}
import graft.reco.{SAR, SARModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Save/load round-trip checks for fitted models — the reference's
  * SerializationFuzzing idea (core/test/fuzzing/Fuzzing.scala:222-298):
  * fit, save, load, re-transform, assert frame equality.
  */
class SerializationSuite extends TestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-ser-$name").toString + "/m"

  private def roundTrip(a: DataFrame, b: DataFrame): Unit = assertDFEq(a, b)

  test("ValueIndexerModel save/load") {
    val df = Seq("b", "a", "c", "a").toDF("v")
    val m = new ValueIndexer().setInputCol("v").setOutputCol("idx").fit(df)
    val p = tmp("vi"); m.write.overwrite().save(p)
    val loaded = ValueIndexerModel.load(p)
    assert(loaded.levels.sameElements(m.levels))
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("TrainedEmbedderModel save/load") {
    val df = (0 until 30).map(i =>
      (i.toLong, if (i % 2 == 0) "alpha beta gamma delta alpha beta"
        else "omega sigma theta kappa omega sigma")).toDF("doc_id", "text")
    val m = new graft.text.TrainedEmbedder().setInputCol("text")
      .setDim(6).setMinCount(1).fit(df)
    val p = tmp("temb")
    m.write.overwrite().save(p)
    val back = graft.text.TrainedEmbedderModel.load(p)
    roundTrip(m.transform(df), back.transform(df))
  }

  test("IncrementalSemDeDupModel save/load") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.02, 0.0, 0.0)),
      (1L, Seq(0.0, 0.02, 1.0, 0.0))).toDF("doc_id", "embedding")
    val batch = Seq(
      (10L, Seq(1.0, 0.05, 0.0, 0.0)),  // near-dup of corpus 0
      (12L, Seq(0.0, 0.0, 0.0, 1.0))    // novel
    ).toDF("doc_id", "embedding")
    val m = new graft.dedup.IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(1).setThreshold(0.99).fit(corpus)
    val p = tmp("isdd"); m.write.overwrite().save(p)
    val back = graft.dedup.IncrementalSemDeDupModel.load(p)
    // the persisted quantizer pins the cell partition and the decisions
    roundTrip(
      m.setCorpusIndex(m.indexCorpus(corpus)).transform(batch),
      back.setCorpusIndex(back.indexCorpus(corpus)).transform(batch))
  }

  test("StreamingSemDeDup save/load (complex quantizer param)") {
    val corpus = Seq(
      (0L, Seq(1.0, 0.02, 0.0, 0.0)),
      (1L, Seq(0.0, 0.02, 1.0, 0.0))).toDF("doc_id", "embedding")
    val batch = Seq(
      (10L, Seq(1.0, 0.05, 0.0, 0.0)),  // near-dup of corpus 0
      (12L, Seq(0.0, 0.0, 0.0, 1.0))    // novel
    ).toDF("doc_id", "embedding")
    val m = new graft.dedup.IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(1).setThreshold(0.99).fit(corpus)
    val stage = new graft.streaming.StreamingSemDeDup()
      .setInputCol("embedding").setFromModel(m)
    val p = tmp("ssdd"); stage.write.overwrite().save(p)
    val back = graft.streaming.StreamingSemDeDup.load(p)
    val idx = m.indexCorpus(corpus)
    roundTrip(
      stage.setCorpusIndex(idx).transform(batch),
      back.setCorpusIndex(idx).transform(batch))
  }

  test("EmbeddingClustererModel save/load") {
    val df = (0 until 40).map { i =>
      val base =
        if (i % 2 == 0) Array(1.0, 0.0, 0.0, 0.1)
        else Array(0.0, 1.0, 0.1, 0.0)
      (i.toLong, base.map(_ + (i % 5) * 0.01).toSeq)
    }.toDF("doc_id", "embedding")
    val m = new graft.sim.EmbeddingClusterer().setInputCol("embedding")
      .setK(2).setSeed(7L).fit(df)
    val p = tmp("eclu"); m.write.overwrite().save(p)
    val back = graft.sim.EmbeddingClustererModel.load(p)
    assert(back.centroids.length == m.centroids.length &&
      back.centroids.zip(m.centroids).forall { case (a, b) =>
        a.sameElements(b)
      })
    roundTrip(m.transform(df), back.transform(df))
  }

  test("UnigramLMModel save/load") {
    val df = Seq((1L, "a a b"), (2L, "b c")).toDF("doc_id", "text")
    val m = new graft.text.UnigramLM().setInputCol("text").setVocabSize(2)
      .fit(df)
    val p = tmp("ulm"); m.write.overwrite().save(p)
    val loaded = graft.text.UnigramLMModel.load(p)
    assert(loaded.vocab.sameElements(m.vocab) &&
      loaded.totalTokens == m.totalTokens &&
      loaded.getOrDefault(loaded.alpha) == m.getOrDefault(m.alpha))
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("StupidBackoffLMModel save/load") {
    val df = Seq((1L, "a b c a b"), (2L, "a b d")).toDF("doc_id", "text")
    val m = new graft.text.StupidBackoffLM().setInputCol("text")
      .setMaxOrder(3).setVocabSize(8).setGramBudget(4).fit(df)
    val p = tmp("sblm"); m.write.overwrite().save(p)
    val loaded = graft.text.StupidBackoffLMModel.load(p)
    assert(loaded.totalTokens == m.totalTokens &&
      loaded.tables.map(_.toSeq).toSeq == m.tables.map(_.toSeq).toSeq)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("BPETokenizerModel save/load") {
    val df = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val m = new graft.text.BPETokenizer().setInputCol("text")
      .setNumMerges(16).fit(df)
    val p = tmp("bpe"); m.write.overwrite().save(p)
    val loaded = graft.text.BPETokenizerModel.load(p)
    assert(loaded.merges.toSeq == m.merges.toSeq)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("UnigramTokenizerModel save/load") {
    val df = Seq((1L, "low low low lower lowest")).toDF("doc_id", "text")
    val m = new graft.text.UnigramTokenizer().setInputCol("text")
      .setVocabSize(12).setSeedSize(64).fit(df)
    val p = tmp("unigram"); m.write.overwrite().save(p)
    val loaded = graft.text.UnigramTokenizerModel.load(p)
    assert(loaded.pieces.toSeq == m.pieces.toSeq)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("QualityClassifierModel save/load (nested LR)") {
    val df = Seq((1L, "good words here", 1.0), (2L, "bad stuff there", 0.0),
      (3L, "good words again", 1.0), (4L, "bad stuff repeated", 0.0))
      .toDF("doc_id", "text", "label")
    val m = new graft.text.QualityClassifier().setInputCol("text")
      .setLabelCol("label").setNumBits(12).setMaxIter(10).fit(df)
    val p = tmp("qc"); m.write.overwrite().save(p)
    val loaded = graft.text.QualityClassifierModel.load(p)
    assert(loaded.lrModel.coefficients == m.lrModel.coefficients)
    roundTrip(m.transform(df).select("doc_id", "quality_pred"),
      loaded.transform(df).select("doc_id", "quality_pred"))
  }

  test("DSIRModel save/load (nested LM pair)") {
    val df = Seq((1L, "a a b", "tgt"), (2L, "b c", "raw"),
      (3L, "c c c", "raw")).toDF("doc_id", "text", "source")
    val m = new graft.text.DSIRScorer().setInputCol("text")
      .setTargetPredicate("source = 'tgt'").setVocabSize(2).setGramSize(1)
      .setSelectThresholdQ4(-100L).fit(df)
    val p = tmp("dsir"); m.write.overwrite().save(p)
    val loaded = graft.text.DSIRModel.load(p)
    assert(loaded.targetLM.vocab.sameElements(m.targetLM.vocab) &&
      loaded.rawLM.totalTokens == m.rawLM.totalTokens &&
      loaded.getOrDefault(loaded.selectThresholdQ4) == -100L)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("CleanMissingDataModel save/load") {
    val df = Seq(Some(1.0), None, Some(3.0)).toDF("x")
    val m = new CleanMissingData().setInputCols(Seq("x")).fit(df)
    val p = tmp("cmd"); m.write.overwrite().save(p)
    val loaded = CleanMissingDataModel.load(p)
    assert(loaded.fillValues == m.fillValues)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("CountSelectorModel save/load") {
    val df = Seq(
      org.apache.spark.ml.linalg.Vectors.sparse(4, Seq((1, 2.0))),
      org.apache.spark.ml.linalg.Vectors.sparse(4, Seq((3, 1.0)))
    ).map(Tuple1(_)).toDF("vec")
    val m = new CountSelector().setInputCol("vec").setOutputCol("sel").fit(df)
    val p = tmp("cs"); m.write.overwrite().save(p)
    val loaded = CountSelectorModel.load(p)
    assert(loaded.indices.sameElements(m.indices))
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("KNNModel save/load") {
    val df = (0 until 50).map(i => (i.toLong, Array(i.toDouble, (i * 7 % 13).toDouble)))
      .toDF("id", "emb")
    val m = new KNN().setInputCol("emb").setIdCol("id").setK(3).fit(df)
    val p = tmp("knn"); m.write.overwrite().save(p)
    val loaded = KNNModel.load(p)
    roundTrip(
      m.transform(df).select(col("id"), col("matches.id").as("n")),
      loaded.transform(df).select(col("id"), col("matches.id").as("n")))
  }

  test("SARModel save/load") {
    val ratings = Seq((1L, "a", 5.0), (1L, "b", 3.0), (2L, "a", 4.0))
      .toDF("user", "item", "rating")
    val m = new SAR().setUserCol("user").setItemCol("item")
      .setRatingCol("rating").fit(ratings)
    val p = tmp("sar"); m.write.overwrite().save(p)
    val loaded = SARModel.load(p)
    roundTrip(m.recommendForAllUsers(2, removeSeen = false),
      loaded.recommendForAllUsers(2, removeSeen = false))
  }

  test("TextFeaturizerModel save/load") {
    val df = Seq("spark scales out", "duck scales in", "spark ducks")
      .toDF("text")
    val m = new graft.featurize.TextFeaturizer().setInputCol("text")
      .setOutputCol("feats").setNumFeatures(1 << 10).fit(df)
    val p = tmp("tf"); m.write.overwrite().save(p)
    val loaded = graft.featurize.TextFeaturizerModel.load(p)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("FeaturizeModel save/load") {
    val df = Seq((1.0, "red", "short text"), (2.0, "blue", "other text"))
      .toDF("num", "cat", "txt")
    val m = new graft.featurize.Featurize()
      .setInputCols(Seq("num", "cat", "txt")).setOutputCol("features")
      .setNumFeatures(1 << 8).fit(df)
    val p = tmp("fz"); m.write.overwrite().save(p)
    val loaded = graft.featurize.FeaturizeModel.load(p)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("TrainedClassifierModel save/load end-to-end") {
    val rnd = new scala.util.Random(9)
    val df = (0 until 120).map { i =>
      val f = rnd.nextDouble() * 10
      (i.toLong, f, if (f > 5) "hi" else "lo")
    }.toDF("id", "f", "label")
    val m = new graft.train.TrainClassifier().setLabelCol("label")
      .setFeatureCols(Seq("f")).setLearner("DecisionTree").fit(df)
    val p = tmp("tc"); m.write.overwrite().save(p)
    val loaded = graft.train.TrainedClassifierModel.load(p)
    roundTrip(
      m.transform(df).select("id", "prediction", "predicted_label"),
      loaded.transform(df).select("id", "prediction", "predicted_label"))
  }

  test("TrainedRegressorModel save/load end-to-end") {
    val rnd = new scala.util.Random(13)
    val df = (0 until 120).map { i =>
      val f = rnd.nextDouble() * 10
      (i.toLong, f, 3.0 * f + 1.0 + rnd.nextGaussian() * 0.1)
    }.toDF("id", "f", "y")
    val m = new graft.train.TrainRegressor().setLabelCol("y")
      .setFeatureCols(Seq("f")).setLearner("DecisionTree").fit(df)
    val p = tmp("tr"); m.write.overwrite().save(p)
    val loaded = graft.train.TrainedRegressorModel.load(p)
    roundTrip(
      m.transform(df).select("id", "prediction"),
      loaded.transform(df).select("id", "prediction"))
  }

  test("RankingTrainValidationSplit winner save/load") {
    val rnd = new scala.util.Random(7)
    val rows = (for {
      u <- 0L until 20L
      group = if (u % 2 == 0) Seq("a", "b", "c") else Seq("x", "y", "z")
      item <- group if rnd.nextDouble() < 0.9
    } yield (u, item, 1.0 + rnd.nextInt(5))).toDF("user", "item", "rating")
    val result = new graft.reco.RankingTrainValidationSplit()
      .setUserCol("user").setItemCol("item").setRatingCol("rating")
      .setK(2).setHoldoutFraction(0.34)
      .setGrid(Seq(("jaccard", 30), ("cooccurrence", 30)))
      .fit(rows)
    val p = tmp("rtvs"); result.bestModel.write.overwrite().save(p)
    val loaded = SARModel.load(p)
    roundTrip(
      result.bestModel.recommendForAllUsers(2, removeSeen = false),
      loaded.recommendForAllUsers(2, removeSeen = false))
  }

  test("TuneHyperparameters best model save/load") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 150).map { i =>
      val f = rnd.nextDouble() * 10
      (i.toLong, f, if (f > 5) "hi" else "lo")
    }.toDF("id", "f", "label")
    val est = new graft.train.TrainClassifier().setLabelCol("label")
      .setFeatureCols(Seq("f"))
    val grids = new graft.automl.HyperparamBuilder()
      .addHyperparam(est.learner,
        graft.automl.DiscreteHyperParam(Seq("DecisionTree", "LogisticRegression")))
      .build(2, seed = 5L)
    val tuned = new graft.automl.TuneHyperparameters(
      Seq(("tc", est, grids)),
      graft.automl.Evaluators.accuracy("label", "predicted_label"),
      numFolds = 2, parallelism = 2).fit(df)
    val p = tmp("tune")
    tuned.bestModel.asInstanceOf[org.apache.spark.ml.util.MLWritable]
      .write.overwrite().save(p)
    val loaded = graft.train.TrainedClassifierModel.load(p)
    roundTrip(
      tuned.bestModel.transform(df).select("id", "prediction", "predicted_label"),
      loaded.transform(df).select("id", "prediction", "predicted_label"))
  }

  test("ClassBalancerModel save/load") {
    val df = (0 until 100).map(i => (i.toLong, if (i % 4 == 0) "a" else "b"))
      .toDF("id", "label")
    val m = new graft.stages.ClassBalancer().setInputCol("label").fit(df)
    val p = tmp("cb"); m.write.overwrite().save(p)
    val loaded = graft.stages.ClassBalancerModel.load(p)
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("IVFPQNearestNeighborsModel save/load") {
    val rnd = new scala.util.Random(11)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val m = new graft.sim.IVFPQNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(4).setNumSub(4).setNBits(4).fit(df)
    m.setK(3).setNProbe(4).setRerankK(200)
    val p = tmp("ivfpq"); m.write.overwrite().save(p)
    val loaded = graft.sim.IVFPQNearestNeighborsModel.load(p)
    assert(loaded.coarse.length == m.coarse.length &&
      loaded.codebooks.length == m.codebooks.length &&
      loaded.getOrDefault(loaded.rerankK) == 200)
    val queries = df.limit(5)
    m.setQueries(queries, "vec_id", "embedding")
    loaded.setQueries(queries, "vec_id", "embedding")
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("IVFNearestNeighborsModel save/load") {
    val rnd = new scala.util.Random(7)
    val df = (0 until 200).map(i =>
      (i.toLong, Array.fill(8)(rnd.nextGaussian()))).toDF("vec_id", "embedding")
    val m = new graft.sim.IVFNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(4).fit(df)
    m.setK(3).setNProbe(4)
    val p = tmp("ivf"); m.write.overwrite().save(p)
    val loaded = graft.sim.IVFNearestNeighborsModel.load(p)
    assert(loaded.centroids.length == m.centroids.length)
    assert(loaded.getOrDefault(loaded.k) == 3)
    val queries = df.limit(5)
    m.setQueries(queries, "vec_id", "embedding")
    loaded.setQueries(queries, "vec_id", "embedding")
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("complex params survive save/load (fn / udf / nested stage / schema)") {
    val df = Seq((1, "x"), (2, "y")).toDF("n", "s")

    val lam = new graft.stages.Lambda()
      .setTransform(d => d.filter(col("n") > 1))
    val p1 = tmp("lam"); lam.write.overwrite().save(p1)
    roundTrip(graft.stages.Lambda.load(p1).transform(df), lam.transform(df))

    val udfT = new graft.stages.UDFTransformer()
      .setInputCols(Seq("n")).setOutputCol("doubled")
      .setExpr(cols => cols.head * 2)
    val p2 = tmp("udf"); udfT.write.overwrite().save(p2)
    roundTrip(graft.stages.UDFTransformer.load(p2).transform(df),
      udfT.transform(df))

    val pre = new graft.text.TextPreprocessor().setInputCol("s")
      .setOutputCol("t").setMap(Map("x" -> "z"))
    val p3 = tmp("pre"); pre.write.overwrite().save(p3)
    val preLoaded = graft.text.TextPreprocessor.load(p3)
    assert(preLoaded.getMap == Map("x" -> "z"))
    roundTrip(preLoaded.transform(df), pre.transform(df))

    val mca = new graft.stages.MultiColumnAdapter()
      .setInputCols(Seq("s")).setOutputCols(Array("s2"))
      .setBaseStage(new graft.text.UnicodeNormalize()
        .setInputCol("in").setOutputCol("out"))
    val p4 = tmp("mca"); mca.write.overwrite().save(p4)
    roundTrip(graft.stages.MultiColumnAdapter.load(p4).transform(df),
      mca.transform(df))

    val jop = new graft.io.http.JSONOutputParser()
      .setDataType(org.apache.spark.sql.types.StructType.fromDDL("a INT"))
    val p5 = tmp("jop"); jop.write.overwrite().save(p5)
    val jopLoaded = graft.io.http.JSONOutputParser.load(p5)
    assert(jopLoaded.getOrDefault(jopLoaded.inputCol) == "response")

    val exp = new graft.explain.TabularLIME()
      .setInputCols(Seq("n")).setNumSamples(8)
      .setScoringFn(d => d.withColumn("score", col("n") * 1.0))
    val p6 = tmp("exp"); exp.write.overwrite().save(p6)
    val expLoaded = graft.explain.TabularLIME.load(p6)
    assert(expLoaded.get(expLoaded.scoringFn).nonEmpty)
  }

  test("hostile uids (quotes, backslashes, newlines) survive save/load") {
    val weird = "u\"id\\with\nhostile\tchars"
    assert(ModelIO.jsonUnescape(ModelIO.jsonEscape(weird)) == weird)
    val stage = new graft.stages.SelectColumns(weird).setCols(Seq("x"))
    // DefaultParamsWritable path handles its own escaping; pin ours too
    val g = new graft.text.UnicodeNormalize(weird).setInputCol("a")
    val p = tmp("weird"); g.write.overwrite().save(p)
    val loaded = graft.text.UnicodeNormalize.load(p)
    assert(loaded.uid == weird)
    assert(stage.uid == weird) // ctor accepts it; nothing sanitizes uids
  }

  test("jsonUnescape decodes json4s short escapes (Spark-written metadata)") {
    // json4s emits \n \t \b \f \r \/ — GraftReader advertises reading
    // DefaultParamsWriter metadata, so these must decode to the control
    // chars, not to literal backslash pairs
    assert(ModelIO.jsonUnescape("""a\nb\tc\bd\fe\rf\/g""") ==
      "a\nb\tc\bd\fe\rf/g")
    assert(ModelIO.jsonUnescape("""A\n""") == "A\n")
  }

  test("paramsJson emits valid JSON for control-char and array values") {
    val stage = new graft.stages.SelectColumns()
      .setCols(Seq("line1\nline2", "tab\there"))
    val json = ModelIO.paramsJson(stage)
    // the U+0000 array sentinel and U+001F separators must be \u-escaped
    assert(!json.exists(_ < ' '), s"raw control char leaked into: $json")
    assert(json.contains("\\u0000") && json.contains("\\u001f"))
    // and the round-trip must restore the exact array
    val copy = new graft.stages.SelectColumns()
    ModelIO.setParamsFromJson(copy, json)
    assert(copy.getCols.toSeq == Seq("line1\nline2", "tab\there"))
  }

  test("ScalarQuantizerModel save/load") {
    val df = Seq((1L, Array(0.0f, 10.0f)), (2L, Array(1.0f, -10.0f)))
      .toDF("vec_id", "embedding")
    val m = new graft.sim.ScalarQuantizer().setInputCol("embedding").fit(df)
    val p = tmp("sq8"); m.write.overwrite().save(p)
    val loaded = graft.sim.ScalarQuantizerModel.load(p)
    assert(loaded.mins.sameElements(m.mins) &&
      loaded.maxs.sameElements(m.maxs))
    roundTrip(m.transform(df), loaded.transform(df))
  }

  test("LanguageIdentifierModel save/load") {
    // tiny but separable bilingual fixture: char-gram features differ
    val docs = (0 until 40).map { i =>
      if (i % 2 == 0) (i.toLong, "the quick brown fox and the lazy dog", "en")
      else (i.toLong, "der schnelle braune fuchs und der hund", "de")
    }.toDF("doc_id", "text", "lang")
    val m = new graft.text.LanguageIdentifier().setInputCol("text")
      .setLabelCol("lang").setMaxIter(10).fit(docs)
    val p = tmp("li"); m.write.overwrite().save(p)
    val loaded = graft.text.LanguageIdentifierModel.load(p)
    assert(loaded.get(loaded.labels).get.sameElements(m.get(m.labels).get))
    roundTrip(m.transform(docs).select("doc_id", "lang_pred"),
      loaded.transform(docs).select("doc_id", "lang_pred"))
  }

  test("round-12 param-only transformers save/load and re-transform") {
    // the text/ingest family added this round: pure-param stages, so
    // the fuzzing contract is save -> load -> transform equality
    val docs = Seq((1L, "<p>Itâ€™s &amp; fine</p>"),
      (2L, "plain line\nsecond line here okay"))
      .toDF("doc_id", "text")
    def rt[T <: org.apache.spark.ml.Transformer](
        stage: T, load: String => T): Unit = {
      val p = tmp(stage.uid.take(8))
      stage.asInstanceOf[org.apache.spark.ml.util.MLWritable]
        .write.overwrite().save(p)
      roundTrip(stage.transform(docs), load(p).transform(docs))
    }
    rt(new graft.text.HtmlTextExtractor().setInputCol("text")
      .setOutputCol("o"), graft.text.HtmlTextExtractor.load)
    rt(new graft.text.MojibakeRepair().setInputCol("text")
      .setOutputCol("o"), graft.text.MojibakeRepair.load)
    rt(new graft.text.DocumentFingerprinter().setInputCol("text")
      .setK(4).setWindow(3), graft.text.DocumentFingerprinter.load)
    rt(new graft.text.C4Filter().setInputCol("text")
      .setMinSentences(1).setMinWordsPerLine(2),
      graft.text.C4Filter.load)
    rt(new graft.text.GopherSignals().setInputCol("text"),
      graft.text.GopherSignals.load)
    // run-time-input stages: params persist, inputs reattach post-load
    val emb = (0 until 40)
      .map(i => (i.toLong, Array(i.toDouble, (i * 3 % 7).toDouble)))
      .toDF("vec_id", "embedding")
    val g = new graft.sim.KNNGraph().setInputCol("embedding")
      .setIdCol("vec_id").setK(3).setBruteForce(true)
    val gp = tmp("knngraph"); g.write.overwrite().save(gp)
    roundTrip(g.transform(emb), graft.sim.KNNGraph.load(gp).transform(emb))
    val fpIdx = graft.dedup.IncrementalDeduplicator
      .fingerprintIndex(docs, "text")
    val bloom = graft.dedup.BloomIncrementalDeduplicator
      .buildIndex(fpIdx, numBuckets = 4)
    val b = new graft.dedup.BloomIncrementalDeduplicator()
      .setInputCol("text").setIdCol("doc_id")
    val bp = tmp("bloom"); b.write.overwrite().save(bp)
    val bl = graft.dedup.BloomIncrementalDeduplicator.load(bp)
    roundTrip(
      b.setBloomIndex(bloom).setCorpusIndex(fpIdx).transform(docs),
      bl.setBloomIndex(bloom).setCorpusIndex(fpIdx).transform(docs))
  }

  test("graft stages survive inside a persisted Spark Pipeline") {
    // Pipeline.load dispatches each stage from $stagePath/metadata —
    // the standard-format file our writers emit via PipelineMetadataShim;
    // without it stages save standalone but can't sit in a Pipeline
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    val df = Seq(("the cat", "a"), ("a dog", "b"), ("the cat", "a"))
      .toDF("text", "tag")
    val pipe = new Pipeline().setStages(Array(
      new graft.text.TextPreprocessor().setInputCol("text")
        .setOutputCol("clean").setMap(Map("cat" -> "feline")),
      new graft.featurize.ValueIndexer().setInputCol("tag")
        .setOutputCol("tag_idx"),
      new graft.stages.SelectColumns()
        .setCols(Seq("clean", "tag_idx"))))
    val fitted = pipe.fit(df)
    val p = tmp("pipe"); fitted.write.overwrite().save(p)
    val loaded = PipelineModel.load(p)
    // GraftWritable transformer, ModelIO-backed fitted model, and a
    // DefaultParamsWritable stage all reload and agree
    roundTrip(fitted.transform(df), loaded.transform(df))
    val pu = tmp("pipe_unfit"); pipe.write.overwrite().save(pu)
    roundTrip(Pipeline.load(pu).fit(df).transform(df), fitted.transform(df))
  }

  test("stateful fitted model loads from inside a persisted PipelineModel") {
    // KNNModel carries real state (the broadcast ball tree) — the
    // Pipeline dispatch must reach its ModelIO-backed reader
    import org.apache.spark.ml.{Pipeline, PipelineModel}
    val df = (0 until 50)
      .map(i => (i.toLong, Array(i.toDouble, (i * 3 % 7).toDouble)))
      .toDF("id", "emb")
    val fitted = new Pipeline().setStages(Array(
      new KNN().setInputCol("emb").setIdCol("id").setK(3))).fit(df)
    val p = tmp("pipe_knn"); fitted.write.overwrite().save(p)
    val loaded = PipelineModel.load(p)
    roundTrip(
      fitted.transform(df).select(col("id"), col("matches.id").as("n")),
      loaded.transform(df).select(col("id"), col("matches.id").as("n")))
  }

  test("IsolationForestModel save/load") {
    val rnd = new scala.util.Random(3)
    val df = (0 until 100).map(_ => (rnd.nextGaussian(), rnd.nextGaussian()))
      .toDF("f1", "f2")
    val m = new IsolationForest().setInputCols(Seq("f1", "f2"))
      .setNumTrees(10).setSubsampleSize(32).fit(df)
    val p = tmp("if"); m.write.overwrite().save(p)
    val loaded = IsolationForestModel.load(p)
    assert(loaded.subsample == m.subsample)
    roundTrip(m.transform(df), loaded.transform(df))
  }
}
