package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class TrainedEmbedderSuite extends TestBase {
  import spark.implicits._

  // two disjoint topic vocabularies: skip-gram only ever sees same-pool
  // contexts, so pooled doc vectors must cluster by topic
  private val poolA = Seq("stellar", "orbit", "comet", "nebula", "quasar",
    "galaxy", "photon", "plasma", "cosmic", "lunar", "solar", "astro")
  private val poolB = Seq("ledger", "audit", "invoice", "payroll", "tax",
    "budget", "equity", "asset", "credit", "debit", "fiscal", "revenue")

  private def synth(n: Int) = (0 until n).map { i =>
    val pool = if (i % 2 == 0) poolA else poolB
    val words = (0 until 16).map(j => pool((i * 7 + j * 13) % 12))
    (i.toLong, i % 2, words.mkString(" "))
  }.toDF("doc_id", "label", "text")

  private def cos(a: Seq[Float], b: Seq[Float]): Double =
    a.zip(b).map { case (x, y) => x * y.toDouble }.sum

  test("planted topics: same-vocabulary docs cluster closer, with margin") {
    val docs = synth(120)
    val m = new TrainedEmbedder().setInputCol("text").setDim(24)
      .setMinCount(1).setMaxIter(4).fit(docs)
    assert(m.vocabSize == 24 && m.dim == 24)
    val embs = m.transform(docs).select("doc_id", "label", "embedding")
      .as[(Long, Int, Seq[Float])].collect()
    val byLabel = embs.groupBy(_._2)
    // unit vectors (normalize default)
    embs.foreach { case (id, _, e) =>
      assert(math.abs(math.sqrt(e.map(x => x * x.toDouble).sum) - 1.0)
        < 1e-5, s"doc $id not unit norm")
    }
    // mean within-topic vs cross-topic cosine, margin-tested
    def meanCos(xs: Seq[(Seq[Float], Seq[Float])]) =
      xs.map { case (a, b) => cos(a, b) }.sum / xs.size
    val a = byLabel(0).map(_._3).toSeq
    val b = byLabel(1).map(_._3).toSeq
    val within = meanCos(a.zip(a.tail) ++ b.zip(b.tail))
    val cross = meanCos(a.zip(b))
    assert(within > cross + 0.2,
      s"within-topic cosine $within should clear cross-topic $cross by 0.2")
    // every doc sits closer to its own topic centroid — the gate's rule
    def centroid(xs: Seq[Seq[Float]]) = {
      val d = xs.head.length
      val c = new Array[Double](d)
      xs.foreach(v => (0 until d).foreach(j => c(j) += v(j)))
      c.map(x => (x / xs.size).toFloat).toSeq
    }
    val (ca, cb) = (centroid(a), centroid(b))
    embs.foreach { case (id, l, e) =>
      val (own, other) = if (l == 0) (ca, cb) else (cb, ca)
      assert(cos(e, own) > cos(e, other), s"doc $id misclustered")
    }
  }

  test("fit is reproducible; transform is partitioning-independent") {
    val docs = synth(80)
    val m1 = new TrainedEmbedder().setInputCol("text").setDim(16)
      .setMinCount(1).fit(docs)
    val m2 = new TrainedEmbedder().setInputCol("text").setDim(16)
      .setMinCount(1).fit(docs.repartition(7))
    // same corpus + params => identical vectors, regardless of input
    // partitioning (md5-ordered draw + single-partition seeded fit)
    assert(m1.get(m1.wordVectors).get.map { case (w, v) => w -> v.toSeq } ==
      m2.get(m2.wordVectors).get.map { case (w, v) => w -> v.toSeq })
    def out(df: org.apache.spark.sql.DataFrame) =
      m1.transform(df).select("doc_id", "embedding")
        .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(out(docs.repartition(5)) == out(docs.coalesce(1)))
  }

  test("save/load round-trips the whole model (vectors included)") {
    val docs = synth(40)
    val m = new TrainedEmbedder().setInputCol("text").setDim(8)
      .setMinCount(1).setNormalize(false).fit(docs)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_temb").toString + "/model"
    m.write.overwrite().save(dir)
    val back = TrainedEmbedderModel.load(dir)
    assert(back.vocabSize == m.vocabSize && back.dim == 8)
    val a = m.transform(docs).select("doc_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val b = back.transform(docs).select("doc_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("null text -> null; OOV-only -> zero vector; clash and vocab guards") {
    val docs = synth(40)
    val m = new TrainedEmbedder().setInputCol("text").setDim(8)
      .setMinCount(1).fit(docs)
    val odd = Seq((1L, null.asInstanceOf[String]), (2L, "zzz unseen"),
      (3L, "stellar zzz")).toDF("doc_id", "text")
    val got = m.transform(odd).select("doc_id", "embedding")
      .as[(Long, Option[Seq[Float]])].collect().toMap
    assert(got(1L).isEmpty)
    assert(got(2L).exists(_.forall(_ == 0.0f)))  // no known token
    assert(got(3L).exists(_.exists(_ != 0.0f)))  // OOV skipped, not fatal
    intercept[IllegalArgumentException] {
      m.setOutputCol("text").transformSchema(odd.schema)
    }
    val e = intercept[IllegalArgumentException] {
      new TrainedEmbedder().setInputCol("text").setMinCount(1)
        .setMaxVocab(4).fit(docs)
    }
    assert(e.getMessage.contains("maxVocab"))
    val e2 = intercept[IllegalArgumentException] {
      new TrainedEmbedder().setInputCol("text").setMinCount(99).fit(docs)
    }
    assert(e2.getMessage.contains("minCount"))
  }

  test("transform plans as a narrow zero-exchange projection") {
    val docs = synth(40)
    val m = new TrainedEmbedder().setInputCol("text").setDim(8)
      .setMinCount(1).fit(docs)
    val plan = m.transform(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("SIF pooling downweights a planted stopword; persists with the model") {
    // every doc carries a heavy shared stopword; two docs sharing ONLY
    // it must look less similar under sif than under flat mean
    val stop = Array.fill(8)("zzfiller").mkString(" ")
    val docs = (0 until 80).map { i =>
      val pool = if (i % 2 == 0) poolA else poolB
      val words = (0 until 8).map(j => pool((i * 7 + j * 13) % 12))
      (i.toLong, s"$stop ${words.mkString(" ")}")
    }.toDF("doc_id", "text")
    def cosAt(m: TrainedEmbedderModel): Double = {
      val e = m.transform(docs).select("doc_id", "embedding")
        .as[(Long, Seq[Float])].collect().toMap
      cos(e(0L), e(1L)) // cross-topic pair: shares only the stopword
    }
    val base = new TrainedEmbedder().setInputCol("text").setDim(24)
      .setMinCount(1).setMaxIter(4)
    val mean = base.fit(docs)
    val sif = base.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setPooling("sif").fit(docs)
    val (cm, cs) = (cosAt(mean), cosAt(sif))
    assert(cs < cm - 0.1,
      s"sif cross-topic cosine $cs should sit well under mean's $cm")
    // frequencies persist: a reloaded sif model pools identically
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sif").toString + "/m"
    sif.write.overwrite().save(dir)
    assert(cosAt(TrainedEmbedderModel.load(dir)) == cs)
    // a model missing frequencies fails fast when asked for sif
    val crippled = mean.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setPooling("sif")
    crippled.clear(crippled.wordFreqs)
    val e = intercept[IllegalArgumentException] {
      crippled.transform(docs)
    }
    assert(e.getMessage.contains("frequencies"))
  }

  test("subwords embed OOV morphological variants near their stems") {
    val docs = synth(120)
    val base = new TrainedEmbedder().setInputCol("text").setDim(24)
      .setMinCount(1).setMaxIter(4)
    val plain = base.fit(docs)
    val sub = base.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setSubwordBits(18).fit(docs)
    // variant docs: every token is a suffixed form ABSENT from the fit
    // vocabulary — the word-lookup path must pool them to zero, the
    // subword path must recover the topic
    val variants = Seq(
      (0L, 0, poolA.map(_ + "ly").mkString(" ")),
      (1L, 1, poolB.map(_ + "ly").mkString(" "))).toDF(
      "doc_id", "label", "text")
    val zeroed = plain.transform(variants).select("embedding")
      .as[Seq[Float]].collect()
    assert(zeroed.forall(_.forall(_ == 0.0f)),
      "word-lookup path should pool all-OOV docs to zero")
    // topic centroids from the in-vocabulary docs (either model: the
    // in-vocab path is identical — asserted below)
    val embs = sub.transform(docs).select("label", "embedding")
      .as[(Int, Seq[Float])].collect()
    def centroid(l: Int) = {
      val xs = embs.filter(_._1 == l).map(_._2)
      val c = new Array[Double](24)
      xs.foreach(v => (0 until 24).foreach(j => c(j) += v(j)))
      c.map(x => (x / xs.size).toFloat).toSeq
    }
    val (ca, cb) = (centroid(0), centroid(1))
    val got = sub.transform(variants).select("label", "embedding")
      .as[(Int, Seq[Float])].collect()
    got.foreach { case (l, e) =>
      assert(e.exists(_ != 0.0f), "subword path left the variant at zero")
      val (own, other) = if (l == 0) (ca, cb) else (cb, ca)
      assert(cos(e, own) > cos(e, other) + 0.2,
        s"variant of topic $l not recovered: own ${cos(e, own)} " +
          s"other ${cos(e, other)}")
    }
    // the in-vocabulary path is bit-identical with subwords on or off
    val a = plain.transform(docs).select("doc_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    val b = sub.transform(docs).select("doc_id", "embedding")
      .as[(Long, Seq[Float])].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("subword vectors persist: a reloaded model embeds OOV identically") {
    val docs = synth(80)
    val m = new TrainedEmbedder().setInputCol("text").setDim(16)
      .setMinCount(1).setMaxIter(2).setSubwordBits(16).fit(docs)
    assert(m.get(m.subwordVectors).exists(_.nonEmpty))
    val oov = Seq((0L, "stellarly orbiting cometish")).toDF("doc_id", "text")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_sub").toString + "/m"
    m.write.overwrite().save(dir)
    val back = TrainedEmbedderModel.load(dir)
    def emb(mm: TrainedEmbedderModel) = mm.transform(oov)
      .select("embedding").as[Seq[Float]].collect().head
    assert(emb(m).exists(_ != 0.0f))
    assert(emb(m) == emb(back))
  }

  test("charGrams: boundary-marked multiset with the fastText count") {
    import TrainedEmbedder.charGrams
    val g = charGrams("where", 3, 6)
    // "<where>" is 7 chars — past maxGram 6, so the full padded form is
    // not a gram at the fastText defaults (it is at maxGram 7)
    assert(g.contains("<wh") && g.contains("re>") && g.contains("where>"))
    assert(!g.contains("<where>"))
    assert(charGrams("where", 3, 7).contains("<where>"))
    // |<w>| = L+2; count = sum over n of max(0, (L+2) - n + 1)
    def count(len: Int, minN: Int, maxN: Int) =
      (minN to maxN).map(n => math.max(0, len + 2 - n + 1)).sum
    assert(g.length == count(5, 3, 6))
    assert(charGrams("a", 3, 6).length == count(1, 3, 6))
    assert(charGrams("", 3, 6).isEmpty) // "<>" is shorter than minN
  }

  test("closes the loop semantically: TrainedEmbedder -> SemDeDup") {
    // the HashedEmbedderSuite end-to-end proof re-run over the trained
    // path: near-duplicate pages collapse under semantic dedup over the
    // library's own LEARNED embeddings (verdict r15 next-round #1)
    val corpus = synth(120).select("doc_id", "text")
    val m = new TrainedEmbedder().setInputCol("text").setDim(24)
      .setMinCount(1).setMaxIter(4).fit(corpus)
    val probe = Seq(
      (1000L, "stellar orbit comet nebula quasar galaxy"),
      (1001L, "stellar orbit comet nebula quasar photon"), // near-dup
      (1002L, "ledger audit invoice payroll tax budget"))
      .toDF("doc_id", "text")
    val withE = m.transform(probe)
    val kept = new graft.dedup.SemDeDup().setInputCol("embedding")
      .setIdCol("doc_id").setNClusters(1).setThreshold(0.97)
      .setKeepRule("minId").transform(withE)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept.contains(1000L) && kept.contains(1002L) &&
      !kept.contains(1001L), s"kept $kept")
  }
}
