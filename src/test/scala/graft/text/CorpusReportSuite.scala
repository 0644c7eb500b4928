package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class CorpusReportSuite extends TestBase {
  import spark.implicits._

  test("closed-form report on a tiny corpus") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),
      (2L, "A  b C", "en", "web"),      // exact dup of 1 after canon
      (3L, "d e", "fr", "book"),
      (4L, "   ", "en", "web")          // empty after tokenization
    ).toDF("doc_id", "text", "lang", "source")
    val r = new CorpusReport().setInputCol("text").transform(docs).head()
    val m = r.getValuesMap[Long](Seq("n_docs", "n_tokens", "n_chars",
      "n_unique_docs", "n_langs", "n_domains", "min_tokens", "max_tokens",
      "n_empty_docs", "n_exact_dups"))
    assert(m("n_docs") == 4 && m("n_tokens") == 8 && m("n_unique_docs") == 3)
    assert(m("n_langs") == 2 && m("n_domains") == 2)
    assert(m("min_tokens") == 0 && m("max_tokens") == 3)
    assert(m("n_empty_docs") == 1 && m("n_exact_dups") == 1)
    assert(m("n_chars") == (5 + 6 + 3 + 3))
  }

  test("composition-table mode: one exact row per group, nulls kept") {
    val docs = Seq(
      (1L, "a b c", "en", "web"),
      (2L, "A  b C", "en", "web"),     // exact dup of 1 within the group
      (3L, "d e", "fr", "book"),
      (4L, "a b c", "fr", "web"),      // dup TEXT but in another group
      (5L, "x", null, "web"))          // null group -> its own row
      .toDF("doc_id", "text", "lang", "source")
    val out = new CorpusReport().setInputCol("text").setGroupByCol("lang")
      .transform(docs)
    assert(out.columns.head == "lang")
    val rows = out.collect().map { r =>
      Option(r.getString(0)) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_unique_docs"),
          r.getAs[Long]("n_exact_dups"), r.getAs[Long]("n_tokens"))
    }.toMap
    assert(rows(Some("en")) == ((2L, 1L, 1L, 6L)))
    // text dup of doc 1 lives in ANOTHER group: not a dup within fr
    assert(rows(Some("fr")) == ((2L, 2L, 0L, 5L)))
    assert(rows(None) == ((1L, 1L, 0L, 1L)))
    // unknown group column fails loudly; '' stays the one-row report
    val e = intercept[IllegalArgumentException] {
      new CorpusReport().setInputCol("text").setGroupByCol("nope")
        .transform(docs)
    }
    assert(e.getMessage.contains("nope"))
    assert(new CorpusReport().setInputCol("text").transform(docs)
      .count() == 1)
  }

  test("partitioning-independent on the sf fixture") {
    val docs = sfTable("documents")
    val op = new CorpusReport().setInputCol("text")
    assertDFEq(op.transform(docs), op.transform(docs.repartition(7)))
  }
}
