package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class BPESuite extends TestBase {
  import spark.implicits._

  // word counts low:3 lower:1 lowest:1 — the Sennrich worked example
  lazy val corpus = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")

  test("learns merges greedily with deterministic tie-breaks, stops dry") {
    val m = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .fit(corpus)
    // (l,o) ties (o,w) at 5 -> pair-asc; then (lo,w)=5, (low,</w>)=3,
    // (low,e)=2; every remaining pair is unique -> early stop
    assert(m.merges.toSeq == Seq(("l", "o"), ("lo", "w"),
      ("low", BPE.EOW), ("low", "e")))
  }

  test("encodes dictionary and unseen words by merge rank") {
    val m = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .fit(corpus)
    val out = m.transform(Seq((1L, "low lowest xyz")).toDF("doc_id", "text"))
      .select("bpe_tokens", "bpe_n_tokens").head()
    assert(out.getSeq[String](0) == Seq("low" + BPE.EOW,
      "lowe", "s", "t", BPE.EOW, "x", "y", "z", BPE.EOW))
    assert(out.getLong(1) == 9L)
  }

  test("decode(encode(text)) reconstructs the canonical text") {
    val docs = sfTable("documents").select("doc_id", "text")
    val m = new BPETokenizer().setInputCol("text").setNumMerges(200)
      .setMaxWordTypes(4096).fit(docs)
    val enc = m.transform(docs)
    val mismatches = enc.select(col("doc_id"),
        m.decode(col("bpe_tokens")).as("rt"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("want"))
      .filter(col("rt") =!= col("want")).count()
    assert(mismatches == 0)
    // and tokenization actually compresses: fewer symbols than characters
    val stats = enc.agg(sum(col("bpe_n_tokens")),
      sum(length(col("text"))).cast("long")).head()
    assert(stats.getLong(0) < stats.getLong(1))
  }

  test("astral-plane code points survive the round trip whole") {
    val emoji = Seq((0L, "a 😀b 😀b c")).toDF("doc_id", "text")
    val m = new BPETokenizer().setInputCol("text").setNumMerges(10).fit(emoji)
    val rt = m.transform(emoji)
      .select(m.decode(col("bpe_tokens"))).as[String].head()
    assert(rt == "a 😀b 😀b c")
  }

  test("adversarial text survives the round trip") {
    // mixed scripts, combining marks, punctuation runs, digits — the
    // losslessness contract must hold for anything whitespace-splittable
    val nasty = Seq(
      (0L, "héllo wörld ñ"),
      (1L, "日本語 テキスト 漢字"),
      (2L, "a+b=c x*y/z (q) [r] {s}"),
      (3L, "é combining ä marks"),
      (4L, "mix3d d1g1ts 42 0x1f"),
      (5L, "𝕞𝕒𝕥𝕙 𝒮𝒸𝓇𝒾𝓅𝓉 😀😀😀")
    ).toDF("doc_id", "text")
    val m = new BPETokenizer().setInputCol("text").setNumMerges(50).fit(nasty)
    val bad = m.transform(nasty)
      .select(col("doc_id"), m.decode(col("bpe_tokens")).as("rt"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("want"))
      .filter(col("rt") =!= col("want")).count()
    assert(bad == 0)
  }

  test("incremental trainer matches the full-rescan reference exactly") {
    // the committed trainer re-counts only affected words through a
    // lazy-deletion heap; this re-derives the merges with the naive
    // formulation (full pair recount + minBy((-c, a, b)) each round)
    // on real corpus text and demands an identical sequence
    val docs = sfTable("documents").select("doc_id", "text").limit(200)
    val numMerges = 150
    val maxTypes = 2048
    val m = new BPETokenizer().setInputCol("text").setNumMerges(numMerges)
      .setMaxWordTypes(maxTypes).fit(docs)
    val dict = docs
      .select(explode(UnigramLM.tokens(col("text"))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w").asc).limit(maxTypes)
      .as[(String, Long)].collect()
    var words = dict.map { case (w, c) => (BPE.symbols(w), c) }
    val expect = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && expect.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(o => Some(o.getOrElse(0L) + c))
      if (counts.isEmpty) go = false
      else {
        val best = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (best._2 < 2) go = false
        else {
          expect += best._1
          words = words.map { case (s, c) =>
            (BPE.mergePair(s, best._1._1, best._1._2), c)
          }
        }
      }
    }
    assert(m.merges.toSeq == expect.toSeq)
  }

  test("executor-wide encode memo never crosses models") {
    // two models with conflicting merge tables encode the same word —
    // the shared companion-object cache must keep them apart
    val mA = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .fit(corpus) // learns low-ish merges
    val mB = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .fit(Seq((0L, "ow ow lo lo lo w w")).toDF("doc_id", "text"))
    val probe = Seq((1L, "low")).toDF("doc_id", "text")
    val a1 = mA.transform(probe).select("bpe_tokens").as[Seq[String]].head()
    val b1 = mB.transform(probe).select("bpe_tokens").as[Seq[String]].head()
    assert(a1 != b1, "fixture models must segment 'low' differently")
    // repeat (cache now warm for both) — answers must be unchanged
    assert(mA.transform(probe).select("bpe_tokens")
      .as[Seq[String]].head() == a1)
    assert(mB.transform(probe).select("bpe_tokens")
      .as[Seq[String]].head() == b1)
  }

  test("model save/load round-trips merges and segmentation") {
    val m = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .fit(corpus)
    val dir = java.nio.file.Files.createTempDirectory("bpe").toString + "/m"
    m.write.overwrite().save(dir)
    val loaded = BPETokenizerModel.load(dir)
    assert(loaded.merges.toSeq == m.merges.toSeq)
    val probe = Seq((1L, "lower low")).toDF("doc_id", "text")
    assertDFEq(m.transform(probe), loaded.transform(probe))
  }
}
