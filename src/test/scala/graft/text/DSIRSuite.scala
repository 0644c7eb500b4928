package graft.text

import graft.TestBase

class DSIRSuite extends TestBase {
  import spark.implicits._

  private def q4(x: Double) = math.floor(x * 10000.0 + 0.5).toLong

  // closed-form unigram fixture (gramSize=1 keeps the arithmetic
  // hand-checkable; gramSize=2 is exercised below and by UnigramLM):
  //  target = doc 1 only: counts a=2, b=1, N=3, vocabSize=2 keeps both;
  //    denom=3+1*3=6 -> p(a)=3/6, p(b)=2/6, p(UNK)=1/6
  //  raw = all: a=2, b=2, c=4, N=8; top-2 by (count desc, token asc) is
  //    {c:4, a:2} (a beats b on the tie); denom=8+3=11 ->
  //    p(c)=5/11, p(a)=3/11, p(UNK)=(8-6+1)/11=3/11 (b is OOV!)
  private def docs = Seq(
    (1L, "a a b", "tgt"),
    (2L, "b c", "raw"),
    (3L, "c c c", "raw"))
    .toDF("doc_id", "text", "source")

  test("DSIRScorer scores the closed-form log importance ratio") {
    val got = new DSIRScorer().setInputCol("text")
      .setTargetPredicate("source = 'tgt'")
      .setVocabSize(2).setGramSize(1)
      .fit(docs).transform(docs)
      .select("doc_id", "dsir_n_tokens", "dsir_logratio_q4", "dsir_selected")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap

    val ceT1 = -(math.log(3.0 / 6) + math.log(3.0 / 6) + math.log(2.0 / 6)) / 3
    val ceR1 = -(math.log(3.0 / 11) + math.log(3.0 / 11) + math.log(3.0 / 11)) / 3
    val ceT2 = -(math.log(2.0 / 6) + math.log(1.0 / 6)) / 2
    val ceR2 = -(math.log(3.0 / 11) + math.log(5.0 / 11)) / 2
    val ceT3 = -(math.log(1.0 / 6) * 3) / 3
    val ceR3 = -(math.log(5.0 / 11) * 3) / 3
    // target doc looks target-like (positive ratio, selected at 0)
    assert(got(1L) == ((1L, 3L, q4(ceR1 - ceT1), true)))
    assert(got(1L)._3 > 0)
    // c-heavy docs look raw-like (negative, rejected)
    assert(got(2L) == ((2L, 2L, q4(ceR2 - ceT2), false)))
    assert(got(3L) == ((3L, 3L, q4(ceR3 - ceT3), false)))
  }

  test("default bigram features: short docs score 0 and threshold gates") {
    val bi = Seq(
      (1L, "x y x y", "tgt"),
      (2L, "z w z", "raw"),
      (3L, "q", "raw")) // < 2 tokens: zero bigrams
      .toDF("doc_id", "text", "source")
    val got = new DSIRScorer().setInputCol("text")
      .setTargetPredicate("source = 'tgt'")
      .setSelectThresholdQ4(1L) // strictly-positive ratio required
      .fit(bi).transform(bi)
      .select("doc_id", "dsir_n_tokens", "dsir_logratio_q4", "dsir_selected")
      .as[(Long, Long, Long, Boolean)].collect().map(r => r._1 -> r).toMap
    assert(got(1L)._2 == 3L && got(1L)._3 > 0 && got(1L)._4)
    assert(got(2L)._2 == 2L && got(2L)._3 < 0 && !got(2L)._4)
    // no grams -> ratio exactly 0 -> below the strict threshold
    assert(got(3L) == ((3L, 0L, 0L, false)))
  }

  test("UnigramLM gramSize=2 fits the closed-form bigram model") {
    // bigrams: doc1 "a b a" -> [a b][b a]; doc2 "b a" -> [b a]
    // counts: "b a"=2, "a b"=1, N=3, V=2 -> denom=6
    val df = Seq((1L, "a b a"), (2L, "b a")).toDF("doc_id", "text")
    val got = new UnigramLM().setInputCol("text").setVocabSize(2)
      .setGramSize(2).fit(df).transform(df)
      .select("doc_id", "lm_n_tokens", "lm_ce_q4")
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    val ce1 = -(math.log(2.0 / 6) + math.log(3.0 / 6)) / 2
    assert(got(1L) == ((1L, 2L, q4(ce1))))
    assert(got(2L) == ((2L, 1L, q4(-math.log(3.0 / 6)))))
  }
}
