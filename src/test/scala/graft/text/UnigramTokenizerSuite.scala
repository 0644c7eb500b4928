package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class UnigramTokenizerSuite extends TestBase {
  import spark.implicits._

  private def cps(s: String): Array[String] =
    s.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Exhaustive best segmentation: every split of the code-point array,
    * pieces scored from the vocab with the single-char UNK fallback —
    * the specification [[Unigram.viterbi]] must match. */
  private def bruteBest(w: Array[String], vocab: Map[String, Double])
      : Double = {
    val n = w.length
    def go(i: Int): Double =
      if (i == n) 0.0
      else {
        var best = Double.NegativeInfinity
        for (j <- i + 1 to n) {
          val p = w.slice(i, j).mkString
          val lp = vocab.getOrElse(p,
            if (j == i + 1) Unigram.UnkLogP else Double.NegativeInfinity)
          if (!lp.isNegInfinity) {
            val rest = go(j)
            if (!rest.isNegInfinity) best = math.max(best, lp + rest)
          }
        }
        best
      }
    go(0)
  }

  test("viterbi matches exhaustive-enumeration best segmentation") {
    val vocab = Map("a" -> -2.0, "b" -> -2.5, "c" -> -3.0, "ab" -> -1.5,
      "bc" -> -1.2, "abc" -> -4.9, "cab" -> -2.1, "abab" -> -3.3)
    val words = Seq("a", "ab", "abc", "abcabc", "ababab", "cba", "abcba",
      "aabbcc", "cabcab", "zzab")
    for (w <- words) {
      val arr = cps(w)
      val (segs, lp) = Unigram.viterbi(arr, vocab, 4)
      assert(segs.mkString == w, s"viterbi of '$w' must cover the word")
      assert(math.abs(lp - bruteBest(arr, vocab)) < 1e-12,
        s"viterbi($w)=$lp != brute ${bruteBest(arr, vocab)}")
      val scored = segs.map(p => vocab.getOrElse(p, Unigram.UnkLogP)).sum
      assert(math.abs(scored - lp) < 1e-12,
        s"returned path of '$w' must score its own logP")
    }
  }

  test("frequent morphemes become pieces and compress the encoding") {
    // 'foo' and 'bar' dominate the corpus; after pruning to a small
    // vocabulary the trainer must keep multi-char pieces covering them
    val docs = Seq((0L, Array.fill(30)("foobar").mkString(" ") + " " +
      Array.fill(20)("barfoo").mkString(" ") + " qux zap")).toDF("doc_id", "text")
    val m = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(14).setSeedSize(64).setMaxPieceLen(4).fit(docs)
    val vocabPieces = m.pieces.map(_._1).toSet
    assert(m.pieces.nonEmpty)
    assert(vocabPieces.exists(p => p.length >= 3 &&
      ("foobar".contains(p) || ("▁foo").contains(p))),
      s"expected a multi-char morpheme piece, got ${vocabPieces.toSeq.sorted}")
    val out = m.transform(docs).select("u_n_tokens").as[Long].head()
    val nChars = docs.select(sum(length(regexp_replace(col("text"), "\\s+", ""))))
      .as[Long].head()
    assert(out < nChars, s"$out pieces must beat $nChars char-level tokens")
  }

  test("decode(encode(text)) reconstructs the canonical text") {
    val docs = sfTable("documents").select("doc_id", "text")
    val m = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(300).setSeedSize(2000).setMaxWordTypes(4096).fit(docs)
    val enc = m.transform(docs)
    val mismatches = enc.select(col("doc_id"),
        m.decode(col("u_tokens")).as("rt"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("want"))
      .filter(col("rt") =!= col("want")).count()
    assert(mismatches == 0)
    val stats = enc.agg(sum(col("u_n_tokens")),
      sum(length(col("text"))).cast("long")).head()
    assert(stats.getLong(0) < stats.getLong(1))
  }

  test("out-of-vocabulary characters survive the round trip") {
    val train = Seq((0L, "low low low lower lowest")).toDF("doc_id", "text")
    val m = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(20).setSeedSize(64).fit(train)
    val oov = Seq((1L, "low zèbra 😀xy 日本語")).toDF("doc_id", "text")
    val rt = m.transform(oov).select(m.decode(col("u_tokens")))
      .as[String].head()
    assert(rt == "low zèbra 😀xy 日本語")
  }

  test("training is deterministic") {
    val docs = sfTable("documents").select("doc_id", "text").limit(200)
    def fitOnce() = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(100).setSeedSize(500).setMaxWordTypes(1024)
      .fit(docs).pieces
    val a = fitOnce()
    val b = fitOnce()
    assert(a.toSeq == b.toSeq)
  }

  test("single-character coverage is never pruned") {
    val docs = Seq((0L, "aaa bbb ccc ddd eee fff ggg")).toDF("doc_id", "text")
    val m = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(8).setSeedSize(64).fit(docs)
    val pieces = m.pieces.map(_._1).toSet
    for (ch <- Seq("a", "b", "c", "d", "e", "f", "g", Unigram.WB))
      assert(pieces.contains(ch), s"coverage char '$ch' missing")
  }

  test("model serialization round-trips") {
    val docs = sfTable("documents").select("doc_id", "text").limit(100)
    val m = new UnigramTokenizer().setInputCol("text")
      .setVocabSize(80).setSeedSize(400).setMaxWordTypes(512).fit(docs)
    val path = java.nio.file.Files
      .createTempDirectory("unigram_model").toString + "/m"
    m.write.overwrite().save(path)
    val loaded = UnigramTokenizerModel.load(path)
    assert(loaded.pieces.toSeq == m.pieces.toSeq)
    assert(loaded.getInputCol == "text")
    val want = m.transform(docs).select("doc_id", "u_tokens")
    val got = loaded.transform(docs).select("doc_id", "u_tokens")
    assert(want.except(got).isEmpty && got.except(want).isEmpty)
  }
}
