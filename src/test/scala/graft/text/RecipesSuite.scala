package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class RecipesSuite extends TestBase {
  import spark.implicits._

  test("webExtraction: blocklist, extraction, repair, cleaning chain end-to-end") {
    import MojibakeRepair.moji
    def page(body: String) =
      s"<html><head><script>x(1)</script></head><body>$body</body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full sentence number $i with plenty of honest words in it.")
      .mkString(" ")
    val df = Seq(
      ("https://ok.com/a", page(s"<p>$longPara</p>")),
      ("https://evil.com/b", page(s"<p>$longPara</p>")), // URL-blocked
      ("https://ok.com/c", page(s"<p>caf${moji("é")} $longPara</p>")),
      ("https://ok.com/d", page("<p>too short.</p>"))) // C4-dropped
      .toDF("url", "html")
    val out = Recipes.webExtraction(blockedDomains = Seq("evil.com"))
      .fit(df).transform(df)
    assert(out.columns.toSeq == Seq("url", "text"))
    val kept = out.select("url").as[String].collect().toSet
    assert(kept == Set("https://ok.com/a", "https://ok.com/c"))
    val repaired = out.filter(col("url") === "https://ok.com/c")
      .select("text").as[String].head()
    assert(repaired.startsWith("café ") && !repaired.contains("Ã"))
  }

  test("webExtraction urlDedupIdCol: duplicate crawls drop before extraction") {
    def page(body: String) =
      s"<html><body>$body</body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full sentence number $i with plenty of honest words in it.")
      .mkString(" ")
    val df = Seq(
      (1L, "https://www.site.com/a?utm_source=feed", page(s"<p>$longPara</p>")),
      (2L, "https://site.com/a/", page(s"<p>$longPara recrawl</p>")),
      (3L, "HTTPS://SITE.com/a#top", page(s"<p>$longPara recrawl2</p>")),
      (4L, "https://site.com/b", page(s"<p>$longPara</p>")),
      (5L, "https://site.com/B", page(s"<p>$longPara</p>"))) // case-distinct path survives
      .toDF("doc_id", "url", "html")
    val out = Recipes.webExtraction(urlDedupIdCol = Some("doc_id"))
      .fit(df).transform(df)
    // min doc_id per canonical URL; /b vs /B are different pages (rawKey)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 4L, 5L))
    assert(!out.columns.contains("__url_norm"))
  }

  test("user columns named like recipe temps survive intact") {
    def page(body: String) = s"<html><body>$body</body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full sentence number $i with plenty of honest words in it.")
      .mkString(" ")
    // every temp name the old fixed-name recipe reserved, user-owned
    val df = Seq(
      (1L, "https://site.com/a", page(s"<p>$longPara</p>"),
        "mine1", "mine2", "mine3"))
      .toDF("doc_id", "url", "html",
        "__extracted", "__repaired", "__url_norm")
    val out = Recipes.webExtraction(urlDedupIdCol = Some("doc_id"))
      .fit(df).transform(df)
    assert(out.count() == 1)
    val r = out.select("__extracted", "__repaired", "__url_norm")
      .as[(String, String, String)].head()
    assert(r == (("mine1", "mine2", "mine3")))
    assert(out.columns.contains("text"))
  }

  test("webExtraction with a language gate persists and reloads") {
    // the gate's fitted LR model now rides a Lambda CLOSURE through
    // complex.bin (round-14 restructure) — this pins that the
    // Java-serialization path holds for a real fitted model
    val docs = Seq(("en", "the cat sat on the mat and the dog barked"),
      ("fr", "le chat est sur le tapis et le chien aboie"))
      .flatMap { case (l, t) => (0 until 30).map(i => (l, s"$t $i")) }
      .toDF("lang", "text")
    val m = new LanguageIdentifier().setInputCol("text")
      .setLabelCol("lang").setNumBits(14).setMaxIter(15).fit(docs)
    val p = java.nio.file.Files.createTempDirectory("lg").toString + "/p"
    Recipes.webExtraction(languageGate = Some((m, Seq("en"))))
      .write.overwrite().save(p)
    val loaded = org.apache.spark.ml.Pipeline.load(p)
    def page(b: String) = s"<html><body><p>$b</p></body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full honest sentence number $i with plenty of words.")
      .mkString(" ")
    val in = Seq(("https://ok.com/a", page(longPara))).toDF("url", "html")
    assert(loaded.fit(in).transform(in).columns.contains("text"))
  }

  test("webExtraction qualityHead: embed -> head-score -> threshold splice") {
    def page(body: String) =
      s"<html><body><p>$body</p></body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full sentence number $i with plenty of honest words in it.")
      .mkString(" ")
    val df = Seq(
      ("https://ok.com/a", page(s"goodtoken $longPara")),
      ("https://ok.com/b", page(longPara)))
      .toDF("url", "html")
    // a head that scores exactly the 'goodtoken' signed contribution:
    // dim-1 hashed embedding, weight picks its sign
    val emb = new HashedEmbedder().setDim(1).setSalt("qh")
      .setNormalize(false).setOutputCol("__e")
    val sign = {
      val w = HashedEmbedder.signBits("goodtoken:qh")
      if (((w(0) >>> 63) & 1L) == 1L) 1.0 else -1.0
    }
    val head = new graft.nn.MLPScorer().setOutputCol("__s")
      .setLayers(Seq(graft.nn.DenseLayer(Array(Array(sign)), Array(0.0))))
    // threshold chosen so only the goodtoken page clears it: both pages
    // share longPara's contribution c, the first adds sign*sign=+1
    val base = Recipes.webExtraction().fit(df).transform(df)
    assert(base.count() == 2)
    val common = new graft.nn.MLPScorer().setInputCol("__e")
      .setOutputCol("__s")
      .setLayers(Seq(graft.nn.DenseLayer(Array(Array(sign)), Array(0.0))))
      .transform(emb.copy(org.apache.spark.ml.param.ParamMap.empty)
        .setInputCol("text").transform(base))
      .filter(col("url") === "https://ok.com/b")
      .select("__s").as[Double].head()
    val out = Recipes.webExtraction(
      qualityHead = Some((emb, head, common + 0.5)))
      .fit(df).transform(df)
    // only the goodtoken page survives, and the transient columns drop
    assert(out.columns.toSeq == Seq("url", "text"))
    assert(out.select("url").as[String].collect().toSeq ==
      Seq("https://ok.com/a"))
  }

  test("webExtraction qualityHead composes with TrainedEmbedderModel") {
    def page(body: String) =
      s"<html><body><p>$body</p></body></html>"
    // corpus: two disjoint-topic pools; head = mean of topic-A word
    // vector directions via a trained model — the FineWeb shape with a
    // LEARNED embedder in the same splice
    val poolA = Seq("stellar", "orbit", "comet", "nebula", "quasar",
      "galaxy", "photon", "plasma")
    val poolB = Seq("ledger", "audit", "invoice", "payroll", "tax",
      "budget", "equity", "asset")
    val corpus = (0 until 60).map { i =>
      val pool = if (i % 2 == 0) poolA else poolB
      (i.toLong, (0 until 12).map(j => pool((i + j * 3) % 8)).mkString(" "))
    }.toDF("doc_id", "text")
    val m = new TrainedEmbedder().setInputCol("text").setDim(12)
      .setMinCount(1).setMaxIter(4).fit(corpus)
    // head weights = the A-centroid direction: A-pages score high
    val ca = {
      val embs = m.transform(corpus.filter(col("doc_id") % 2 === 0))
        .select("embedding").as[Seq[Float]].collect()
      val c = new Array[Double](12)
      embs.foreach(v => (0 until 12).foreach(j => c(j) += v(j)))
      c.map(_ / embs.length)
    }
    val head = new graft.nn.MLPScorer().setOutputCol("__s")
      .setLayers(Seq(graft.nn.DenseLayer(Array(ca), Array(0.0))))
    val sentence = "These are honest filler words to pass cleaning rules."
    val bodyA = s"stellar orbit comet nebula quasar galaxy photon " +
      s"plasma. $sentence $sentence $sentence $sentence $sentence"
    val bodyB = s"ledger audit invoice payroll tax budget equity " +
      s"asset. $sentence $sentence $sentence $sentence $sentence"
    // self-calibrating threshold: score both page texts directly (the
    // extracted text IS the paragraph body), split at the midpoint —
    // robust to training noise while still requiring real separation
    def score(t: String) = head.copy(org.apache.spark.ml.param.ParamMap.empty)
      .setInputCol("embedding")
      .transform(m.transform(Seq((1L, t)).toDF("doc_id", "text")))
      .select("__s").as[Double].head()
    val (sa, sb) = (score(bodyA), score(bodyB))
    assert(sa > sb + 0.1, s"topic-A page should outscore B: $sa vs $sb")
    val df = Seq(
      ("https://a.com/1", page(bodyA)),
      ("https://b.com/2", page(bodyB)))
      .toDF("url", "html")
    val out = Recipes.webExtraction(
      qualityHead = Some((m, head, (sa + sb) / 2)))
      .fit(df).transform(df)
    assert(out.select("url").as[String].collect().toSeq ==
      Seq("https://a.com/1"))
  }

  test("corpusCuration: gate, dedup, deterministic order") {
    val body = (1 to 60).map(i => s"word$i").mkString(" ")
    val df = Seq(
      (1L, body), (2L, body), // dup pair -> min id survives
      (3L, "tiny"), // word-count gate drops
      (4L, body + " unique tail here")).toDF("doc_id", "text")
    val out = Recipes.corpusCuration(minWords = 50).fit(df).transform(df)
    assert(out.select("doc_id").as[Long].collect().toSet == Set(1L, 4L))
    assert(out.columns.contains("shuffle_pos"))
    // deterministic: same seed -> same permutation
    val again = Recipes.corpusCuration(minWords = 50).fit(df).transform(df)
    assertDFEq(out, again)
  }

  test("clusterBalance: per-cluster cap holds, assignments ride along") {
    val docs = spark.range(120).select(col("id").as("doc_id"),
      concat(lit("topic"), pmod(col("id"), lit(3)),
        lit(" body words repeated "), col("id")).as("text"))
    val out = Recipes.clusterBalance(dim = 16, k = 3, capPerCluster = 10)
      .fit(docs).transform(docs)
    assert(out.columns.contains("cluster") &&
      out.columns.contains("centroid_sim_q4"))
    val sizes = out.groupBy("cluster").count().select("count")
      .as[Long].collect()
    assert(sizes.forall(_ <= 10), sizes.toSeq)
    assert(out.count() > 0)
    // deterministic end-to-end
    val again = Recipes.clusterBalance(dim = 16, k = 3, capPerCluster = 10)
      .fit(docs).transform(docs)
    assertDFEq(out.select("doc_id", "cluster"),
      again.select("doc_id", "cluster"))
  }

  test("recipes persist as Pipelines (Lambda fn rides complex params)") {
    val p = java.nio.file.Files.createTempDirectory("recipe").toString + "/p"
    Recipes.webExtraction(blockedDomains = Seq("evil.com"))
      .write.overwrite().save(p)
    val loaded = org.apache.spark.ml.Pipeline.load(p)
    assert(loaded.getStages.length == 2)
    // the loaded Lambda still transforms (fn rides complex.bin)
    def page(body: String) = s"<html><body>$body</body></html>"
    val longPara = (1 to 6).map(i =>
      s"This is a full sentence number $i with plenty of honest words.")
      .mkString(" ")
    val df = Seq(("https://ok.com/a", page(s"<p>$longPara</p>")))
      .toDF("url", "html")
    assert(loaded.fit(df).transform(df).count() == 1)
  }
}
