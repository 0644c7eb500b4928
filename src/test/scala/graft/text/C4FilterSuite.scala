package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class C4FilterSuite extends TestBase {
  import spark.implicits._

  private def clean(pages: (Long, String)*): Map[Long, String] =
    new C4Filter().setInputCol("text").setMinSentences(1)
      .transform(pages.toDF("doc_id", "text"))
      .select("doc_id", "c4_text").as[(Long, String)].collect().toMap

  test("line rules: terminal punctuation, word floor, javascript") {
    val out = clean(
      0L -> List(
        "This line survives the filter.",
        "no terminal punctuation",
        "Too short.",
        "Please enable JavaScript to continue.",
        "Ends with a question mark?",
        "Ends with an exclamation!",
        "He said \"quoted.\"").mkString("\n"))
    assert(out(0L) == List(
      "This line survives the filter.",
      "Ends with a question mark?",
      "Ends with an exclamation!",
      "He said \"quoted.\"").mkString("\n"))
  }

  test("page rules: lorem ipsum, brace, bad words, sentence floor") {
    val f = new C4Filter().setInputCol("text").setMinSentences(2)
      .setBadWords(Array("verboten"))
    val pages = Seq(
      (0L, "A good first sentence here.\nAnd a good second one."),
      (1L, "Mentions lorem ipsum filler text.\nOtherwise a fine page."),
      (2L, "Contains a brace { inline anyway.\nSecond sentence is fine."),
      (3L, "This page says verboten words.\nSecond sentence is fine."),
      (4L, "Only one sentence survives here.\nno punct so this dies"))
      .toDF("doc_id", "text")
    val kept = f.transform(pages).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(0L))
  }

  test("page literals are checked on the CLEANED text") {
    // the brace line fails the terminal-punct rule, so it never reaches
    // the cleaned text — the page survives (ordering semantics pinned)
    val out = clean(
      0L -> "function() { return 1 }\nA perfectly good sentence remains.")
    assert(out(0L) == "A perfectly good sentence remains.")
  }

  test("sentence floor counts terminal punctuation in the cleaned text") {
    val f = new C4Filter().setInputCol("text").setMinSentences(3)
    val pages = Seq(
      (0L, "One sentence. Two sentences. Three sentences."),
      (1L, "One sentence. Two sentences only."))
      .toDF("doc_id", "text")
    assert(f.transform(pages).select("doc_id").as[Long].collect().toSet
      == Set(0L))
  }

  test("defaults drop nothing from a clean multi-sentence page") {
    val text = (1 to 6).map(i => s"Sentence number $i stands correct.")
      .mkString("\n")
    val out = new C4Filter().setInputCol("text")
      .transform(Seq((0L, text)).toDF("doc_id", "text"))
    assert(out.count() == 1)
    assert(out.select("c4_text").as[String].head() == text)
  }

  test("empty pages and all-dropped pages are removed") {
    val f = new C4Filter().setInputCol("text").setMinSentences(1)
    val pages = Seq((0L, ""), (1L, "no punct\nstill no punct"))
      .toDF("doc_id", "text")
    assert(f.transform(pages).count() == 0)
  }
}
