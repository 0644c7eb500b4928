package graft.text

import graft.TestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class StupidBackoffSuite extends TestBase {
  import spark.implicits._

  // counts: a:3 b:3 c:2 d:1 (N=9, V=4); bigrams: "a b":3 "b c":2
  // "c a":1 "b d":1; trigrams: "a b c":2 "b c a":1 "c a b":1 "a b d":1
  lazy val corpus = Seq(
    (0L, "a b c a b c"),
    (1L, "a b d")
  ).toDF("doc_id", "text")

  private def fitted(budget: Int = 1024) =
    new StupidBackoffLM().setInputCol("text").setMaxOrder(3)
      .setVocabSize(1024).setGramBudget(budget).fit(corpus)

  private def rowFor(m: StupidBackoffLMModel,
      df: org.apache.spark.sql.DataFrame, id: Long): Row =
    m.transform(df).filter(col("doc_id") === id)
      .select("sb_n_tokens", "sb_hits_1", "sb_hits_2", "sb_hits_3", "sb_ce")
      .head()

  test("closed-form scores on a fully-hit document") {
    // "a b d": pos0 'a' -> order1 add-alpha (3+1)/14; pos1 'b' -> order2
    // c("a b")/c("a")=3/3; pos2 'd' -> order3 c("a b d")/c("a b")=1/3
    val r = rowFor(fitted(), corpus, 1L)
    assert(r.getLong(0) == 3L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
    val expected = -(math.log(4.0 / 14) + math.log(3.0 / 3.0) +
      math.log(1.0 / 3.0)) / 3
    assert(math.abs(r.getDouble(4) - expected) < 1e-12)
  }

  test("backoff multiplies 0.4 per skipped order, UNK pools at the base") {
    // "c d x": pos0 'c' -> (2+1)/14; pos1 'd' -> "c d" unseen, one
    // backoff to unigram (1+1)/14; pos2 'x' -> "c d x" and "d x" unseen,
    // two backoffs to the UNK base (cUnk=0 -> (0+1)/14)
    val probe = Seq((9L, "c d x")).toDF("doc_id", "text")
    val r = rowFor(fitted(), probe, 9L)
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((3L, 0L, 0L)))
    val expected = -(math.log(3.0 / 14) + math.log(0.4 * (2.0 / 14)) +
      math.log(0.4 * 0.4 * (1.0 / 14))) / 3
    assert(math.abs(r.getDouble(4) - expected) < 1e-12)
  }

  test("a pruned gram or pruned context forces backoff") {
    // gramBudget=2: bigrams {"a b":3,"b c":2}, trigrams {"a b c":2,
    // "a b d":1 (count-1 tie, gram asc)}. Scoring "b c a": pos2 'a' has
    // trigram "b c a" PRUNED -> backoff; bigram "c a" PRUNED -> backoff
    // to unigram (3+1)/14 with factor 0.4*0.4
    val m = fitted(budget = 2)
    val probe = Seq((9L, "b c a")).toDF("doc_id", "text")
    val r = rowFor(m, probe, 9L)
    // pos0 'b': order1 (4/14); pos1 'c': bigram "b c" kept, ctx 'b'
    // in vocab -> order2 2/3
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((2L, 1L, 0L)))
    val expected = -(math.log(4.0 / 14) + math.log(2.0 / 3.0) +
      math.log(0.4 * 0.4 * (4.0 / 14))) / 3
    assert(math.abs(r.getDouble(4) - expected) < 1e-12)
  }

  test("empty and whitespace-only documents score zero") {
    val probe = Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text")
    val out = fitted().transform(probe)
      .select("sb_n_tokens", "sb_ce", "sb_ce_q4").collect()
    out.foreach { r =>
      assert(r.getLong(0) == 0L && r.getDouble(1) == 0.0 && r.getLong(2) == 0L)
    }
  }

  test("model save/load round-trips tables and scores identically") {
    val m = fitted(budget = 2)
    val dir = java.nio.file.Files.createTempDirectory("sblm").toString + "/m"
    m.write.overwrite().save(dir)
    val loaded = StupidBackoffLMModel.load(dir)
    assert(loaded.totalTokens == m.totalTokens)
    assert(loaded.tables.map(_.toSeq).toSeq == m.tables.map(_.toSeq).toSeq)
    val probe = Seq((9L, "b c a x")).toDF("doc_id", "text")
    assertDFEq(m.transform(probe), loaded.transform(probe))
  }

  test("scores are partitioning-independent") {
    val docs = sfTable("documents").select("doc_id", "text")
    val m = new StupidBackoffLM().setInputCol("text").setMaxOrder(3)
      .setVocabSize(16).setGramBudget(32).fit(docs)
    val a = m.transform(docs).select("doc_id", "sb_ce_q4")
    val b = m.transform(docs.repartition(7)).select("doc_id", "sb_ce_q4")
    assertDFEq(a, b)
  }
}
