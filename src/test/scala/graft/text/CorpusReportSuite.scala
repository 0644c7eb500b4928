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

  test("partitioning-independent on the sf fixture") {
    val docs = sfTable("documents")
    val op = new CorpusReport().setInputCol("text")
    assertDFEq(op.transform(docs), op.transform(docs.repartition(7)))
  }
}
