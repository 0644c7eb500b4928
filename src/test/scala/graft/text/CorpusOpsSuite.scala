package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class CorpusOpsSuite extends TestBase {
  import spark.implicits._

  test("FrequentNGrams counts every occurrence, ordered (cnt desc, gram)") {
    val docs = Seq(
      (0L, "a b c a b c a b c"), // "a b c" x3 (+ overlaps "b c a" x2, "c a b" x2)
      (1L, "a b c d"),           // "a b c" again, "b c d"
      (2L, "x y")                // too short for 3-grams
    ).toDF("doc_id", "text")
    val out = new FrequentNGrams().setInputCol("text").setN(3).setTopK(3)
      .transform(docs).as[(String, Long)].collect().toSeq
    assert(out == Seq(("a b c", 4L), ("b c a", 2L), ("c a b", 2L)))
  }

  test("FrequentNGrams lowercases and is partitioning-independent") {
    val docs = Seq((0L, "The Cat Sat"), (1L, "the cat sat here"))
      .toDF("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      new FrequentNGrams().setInputCol("text").setN(3).setTopK(5)
        .transform(d).as[(String, Long)].collect().toSeq
    val a = run(docs.repartition(5))
    assert(a.head == (("the cat sat", 2L)))
    assert(a == run(docs.coalesce(1)))
  }

  test("QualityFilter keeps structurally sound docs and drops the rest") {
    val good = "the quick brown fox jumps over the lazy dog and runs to " +
      "the river bank where it rests in the shade of a tall tree for a while"
    val tooShort = "tiny doc"
    val punctSoup = Seq.fill(30)("!?.,;:").mkString(" ")
    val noStopwords = Seq.fill(40)("zorp").mkString(" ")
    val docs = Seq((0L, good), (1L, tooShort), (2L, punctSoup),
      (3L, noStopwords)).toDF("doc_id", "text")
    val kept = new QualityFilter().setInputCol("text")
      .setMinTokens(20).setMaxTokens(1000)
      .setMinQualityQ4(4000L).setMinStopwordHits(1L)
      .transform(docs).select("doc_id").as[Long].collect().toSeq
    assert(kept == Seq(0L))
  }

  test("GopherSignals counts structural signals on hand-built pages") {
    val docs = Seq(
      // 3 lines; 1 bullet-start; 1 ellipsis-end; words: alpha except "42"
      (1L, "- first item\nplain words here 42\nwait for it..."),
      // unicode bullet + unicode ellipsis; '#'s and a '...' mid-line
      (2L, "• bullet\nc# and ## plus mid... dots\nends with…"),
      // empty-after-trim lines are dropped; all-alpha words
      (3L, "one two\n   \nthree"),
      (4L, ""))
      .toDF("doc_id", "text")
    val got = new GopherSignals().setInputCol("text").transform(docs)
      .select("doc_id", "gs_n_words", "gs_n_alpha_words", "gs_n_symbols",
        "gs_n_lines", "gs_n_bullet_lines", "gs_n_ellipsis_lines",
        "gs_alpha_word_q4", "gs_symbol_word_q4")
      .as[(Long, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().map(r => r._1 -> r).toMap
    // doc 1: 10 words ("-" counts, "42" has no letter -> 8 alpha);
    // symbols: one "..."; 3 lines, 1 bullet, 1 ellipsis-ended
    assert(got(1L) == ((1L, 10L, 8L, 1L, 3L, 1L, 1L, 8000L, 1000L)))
    // doc 2: 10 words; alpha all but "##" and "•" (c#, mid..., ends,
    // with… carry letters) -> 8; symbols: 3 '#' + 1 '...' + 1 '…' = 5;
    // 3 lines, 1 bullet (•), 1 ellipsis-ended (…)
    assert(got(2L) == ((2L, 10L, 8L, 5L, 3L, 1L, 1L, 8000L, 5000L)))
    assert(got(3L) == ((3L, 3L, 3L, 0L, 2L, 0L, 0L, 10000L, 0L)))
    // empty doc: zero everything, q4 denominators guarded to 0
    assert(got(4L) == ((4L, 0L, 0L, 0L, 0L, 0L, 0L, 0L, 0L)))
  }

  test("GopherSignals kernel keeps Spark-expression edge semantics") {
    // Spark trim strips ' ' ONLY: a tab-padded line survives as
    // nonempty (Java String.trim would drop it); null behaves as "";
    // codepoint lengths (not UTF-16 units) feed the word stats
    val docs = Seq(
      (1L, "\t\nreal line"), // tab line counts; 3 words ("\t" is ws-split away... no: "\t\n" splits to nothing)
      (2L, null: String),
      (3L, "a 😀b c")) // emoji word: 2 codepoints, has alpha
      .toDF("doc_id", "text")
    val got = new GopherSignals().setInputCol("text").transform(docs)
      .select("doc_id", "gs_n_words", "gs_n_lines", "gs_n_alpha_words")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 2L, 2L, 2L))) // "\t" line trims to "\t": nonempty
    assert(got(2L) == ((2L, 0L, 0L, 0L)))
    assert(got(3L) == ((3L, 3L, 1L, 3L)))
    // the kernel's word chars count codepoints: words a / 😀b / c have
    // lengths 1,2,1 (not UTF-16 units 1,3,1); distinct-stopword hits
    // are case-insensitive whole tokens
    val s = GopherStructural.profile("a 😀b c", Array.empty)
    assert(s.nWords == 3L && s.wordChars == 4L)
    val s2 = GopherStructural.profile("The THE the bear",
      Array("the", "be", "of"))
    assert(s2.stopHits == 1L)
  }

  test("QualityFilter thresholds mirror DocumentAnalyzer signals exactly") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val kept = new QualityFilter().setInputCol("text")
      .setMinTokens(40).setMinQualityQ4(4000L).setMinStopwordHits(1L)
      .transform(corpus).select("doc_id").as[Long].collect().sorted
    val expected = new DocumentAnalyzer().setInputCol("text")
      .transform(corpus)
      .filter(col("n_tokens") >= 40 && col("n_tokens") <= 100000 &&
        col("quality_q4") >= 4000 && col("n_stop") >= 1)
      .select("doc_id").as[Long].collect().sorted
    assert(kept.sameElements(expected) && kept.nonEmpty)
  }
}
