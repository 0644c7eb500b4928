package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class LanguageModelSuite extends TestBase {
  import spark.implicits._

  // closed-form fixture: counts a=2, b=2, c=1; N=5. vocabSize=2 keeps
  // {a, b} (count desc, token asc), c pools into UNK (c_unk=1).
  // denom = 5 + 1*(2+1) = 8; p(a)=p(b)=3/8, p(UNK)=2/8.
  private def docs = Seq((1L, "a a b"), (2L, "b c"), (3L, "   "))
    .toDF("doc_id", "text")

  test("UnigramLM matches the closed-form add-one model incl. UNK pooling") {
    val out = new UnigramLM().setInputCol("text").setVocabSize(2)
      .fit(docs).transform(docs)
      .select("doc_id", "lm_n_tokens", "lm_n_oov", "lm_ce_q4")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    def q4(ce: Double) = math.floor(ce * 10000.0 + 0.5).toLong
    // doc 1: all tokens at p=3/8 -> ce = ln(8/3)
    assert(out(1L) == ((1L, 3L, 0L, q4(math.log(8.0 / 3.0)))))
    // doc 2: one in-vocab (3/8), one UNK (2/8)
    val ce2 = (math.log(8.0 / 3.0) + math.log(8.0 / 2.0)) / 2.0
    assert(out(2L) == ((2L, 2L, 1L, q4(ce2))))
    // whitespace-only doc: zero tokens, zero ce
    assert(out(3L) == ((3L, 0L, 0L, 0L)))
  }

  test("UnigramLM vocab cut is deterministic under count ties") {
    // a and b tie at count 2; vocabSize=1 must keep 'a' (token asc) and
    // push b to UNK: doc 1 then has one OOV, doc 2 has two
    val out = new UnigramLM().setInputCol("text").setVocabSize(1)
      .fit(docs).transform(docs)
      .select("doc_id", "lm_n_oov").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 1L, 2L -> 2L, 3L -> 0L))
  }

  test("UnigramLM scores an unseen frame with the fitted corpus statistics") {
    val m = new UnigramLM().setInputCol("text").setVocabSize(2).fit(docs)
    val fresh = Seq((9L, "a zzz")).toDF("doc_id", "text")
    val r = m.transform(fresh)
      .select("lm_n_tokens", "lm_n_oov").as[(Long, Long)].head()
    assert(r == ((2L, 1L))) // zzz was never in the corpus -> UNK
    assert(m.vocab.map(_._1).toSeq == Seq("a", "b") && m.totalTokens == 5L)
  }
}
