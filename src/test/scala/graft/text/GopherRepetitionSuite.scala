package graft.text

import graft.TestBase
import graft.text.GopherRepetition.Profile

class GopherRepetitionSuite extends TestBase {
  import spark.implicits._

  test("overlap-aware duplicate n-gram coverage counts positions once") {
    // "a a a a a a": the duplicated 5-gram "a a a a a" occurs at
    // positions 1 and 2 — overlapping — and together covers ALL six
    // word positions exactly once each
    val p = GopherRepetition.profile("a a a a a a")
    assert(p.nWords == 6)
    assert(p.dup5Q4 == 10000)          // 6 covered chars / 6 total
    assert(p.dup6Q4 == 0)              // single 6-gram: not duplicated
    assert(p.dup7Q4 == 0 && p.dup10Q4 == 0)
    // top 2-gram "a a" occurs 5 times, 2 word chars: q4(10, 6)
    assert(p.top2Q4 == 16667)
    assert(p.top3Q4 == 20000)          // 4 * 3 chars / 6
    assert(p.top4Q4 == 20000)          // 3 * 4 chars / 6
    assert(p.nLines == 1 && p.dupLineQ4 == 0)
    assert(p.nParas == 1 && p.dupParaQ4 == 0)
  }

  test("line and paragraph duplicate fractions (chars weighted)") {
    // lines: x, y, x, P1, P1 -> 4 of 5 duplicated, 6 of 7 chars
    // paragraphs: "x\ny\nx", P1, P1 -> 2 of 3 duplicated, 4 of 9 chars
    val p = GopherRepetition.profile("x\ny\nx\n\nP1\n\nP1")
    assert(p.nLines == 5)
    assert(p.dupLineQ4 == 8000)
    assert(p.dupLineCharQ4 == 8571)    // floor(6/7*10000+0.5)
    assert(p.nParas == 3)
    assert(p.dupParaQ4 == 6667)
    assert(p.dupParaCharQ4 == 4444)    // floor(4/9*10000+0.5)
    assert(p.nWords == 5)
    // all 2-grams unique -> tie broken to the codepoint-smallest gram
    // "P1 P1" (4 word chars of 7 total)
    assert(p.top2Q4 == 5714)
    assert(p.top3Q4 == 7143)           // "x P1 P1": 5 of 7
    assert(p.top4Q4 == 7143)           // "x y x P1": 5 of 7
    assert(p.dup5Q4 == 0)              // the only 5-gram is unique
  }

  test("degenerate inputs yield all-zero profiles") {
    val zero = Profile(0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0)
    assert(GopherRepetition.profile(null) == zero)
    assert(GopherRepetition.profile("") == zero)
    // SPACE-only trim (the oracle's DuckDB trim): each '\n'-split line
    // ("   " and "  ") empties, but the single paragraph "   \n  "
    // trims to "\n" — nonempty, so it COUNTS (Java trim would drop it,
    // which is exactly the divergence the round-13 review caught)
    val ws = GopherRepetition.profile("   \n  ")
    assert(ws == zero.copy(nParas = 1))
    // one word: no grams of any order
    val one = GopherRepetition.profile("solo")
    assert(one.nWords == 1 && one.top2Q4 == 0 && one.dup5Q4 == 0)
    // CRLF parity with the oracle: 'a\r' and 'a' are DISTINCT lines
    // (space-only trim keeps the \r, as DuckDB trim does)
    val crlf = GopherRepetition.profile("a\r\na\nrest.")
    assert(crlf.nLines == 3 && crlf.dupLineQ4 == 0)
  }

  test("transformer emits the full 16-column profile in order") {
    val df = Seq((1L, "a a a a a a"), (2L, "x\ny\nx\n\nP1\n\nP1"))
      .toDF("doc_id", "text")
    val out = new GopherRepetition().setInputCol("text").transform(df)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text") ++ GopherRepetition.fields.map(_._1))
    val r = out.orderBy("doc_id")
      .select("gr_dup_5gram_char_q4", "gr_dup_line_q4", "gr_n_words")
      .as[(Long, Long, Long)].collect()
    assert(r(0) == ((10000L, 0L, 6L)))
    assert(r(1) == ((0L, 8000L, 5L)))
    // a taken gr_profile name must not collide with the temp column
    val clash = df.withColumn("gr_profile",
      org.apache.spark.sql.functions.lit(1))
    val out2 = new GopherRepetition().setInputCol("text").transform(clash)
    assert(out2.columns.contains("gr_profile") &&
      out2.columns.contains("gr_n_words"))
  }
}
