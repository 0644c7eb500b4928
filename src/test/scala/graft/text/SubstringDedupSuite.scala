package graft.text

import graft.TestBase

class SubstringDedupSuite extends TestBase {
  import spark.implicits._

  // k=3 fixture, all windows hand-enumerable:
  //  doc 1 "a b c d e f"  windows: [a b c][b c d][c d e][d e f]
  //  doc 2 "x a b c d y"  windows: [x a b][a b c][b c d][c d y]
  //  doc 3 "p q r s"      windows: [p q r][q r s]        (all unique)
  //  doc 4 "m m m m m m"  window [m m m] occurs 4x WITHIN the doc
  //  doc 5 "u v w z z z u v w" — [u v w] at 0 and 6: two disjoint spans
  //  doc 6 ""             empty
  // duplicated windows: "a b c" (d1@0, d2@1), "b c d" (d1@1, d2@2),
  // "m m m" (d4@0..3), "u v w" (d5@0, d5@6)
  private def docs = Seq(
    (1L, "a b c d e f"),
    (2L, "x a b c d y"),
    (3L, "p q r s"),
    (4L, "m m m m m m"),
    (5L, "u v w z z z u v w"),
    (6L, ""))
    .toDF("doc_id", "text")

  private def run(df: org.apache.spark.sql.DataFrame) =
    new ExactSubstringDeduplicator().setInputCol("text")
      .setMinMatchTokens(3)
      .transform(df)
      .select("doc_id", "es_n_tokens", "es_n_windows", "es_n_dup_windows",
        "es_n_spans", "es_n_dup_tokens", "es_dup_frac_q4", "es_text")
      .as[(Long, Long, Long, Long, Long, Long, Long, String)]
      .collect().map(r => r._1 -> r).toMap

  test("ExactSubstringDeduplicator removes every repeated >=k-token span") {
    val got = run(docs)
    // d1: starts [0,1] merge into [0,4): 4 dup tokens, kept "e f"
    assert(got(1L) == ((1L, 6L, 4L, 2L, 1L, 4L, 6667L, "e f")))
    // d2: starts [1,2] merge into [1,5): kept ends "x y"
    assert(got(2L) == ((2L, 6L, 4L, 2L, 1L, 4L, 6667L, "x y")))
    // d3: untouched (text whitespace-normalized by contract)
    assert(got(3L) == ((3L, 4L, 2L, 0L, 0L, 0L, 0L, "p q r s")))
    // d4: self-repetition — whole doc is one merged span, removed
    assert(got(4L) == ((4L, 6L, 4L, 4L, 1L, 6L, 10000L, "")))
    // d5: two DISJOINT spans [0,3) and [6,9); middle "z z z" survives
    assert(got(5L) == ((5L, 9L, 7L, 2L, 2L, 6L, 6667L, "z z z")))
    // d6: empty doc
    assert(got(6L) == ((6L, 0L, 0L, 0L, 0L, 0L, 0L, "")))
  }

  test("results are partitioning-independent") {
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("touching spans merge; overlap accounting never double-counts") {
    // "g h i g h i g h i": [g h i] at 0,3,6 and [h i g] at 1,4 and
    // [i g h] at 2,5 — every window duplicated, one span covers all
    val df = Seq((1L, "g h i g h i g h i")).toDF("doc_id", "text")
    val got = run(df)
    assert(got(1L) == ((1L, 9L, 7L, 7L, 1L, 9L, 10000L, "")))
  }

  test("minOccurrences raises the duplication bar") {
    // "a b c" occurs twice — below a minOccurrences=3 bar, nothing removed
    val got = new ExactSubstringDeduplicator().setInputCol("text")
      .setMinMatchTokens(3).setMinOccurrences(3)
      .transform(docs)
      .select("doc_id", "es_n_dup_windows").as[(Long, Long)]
      .collect().toMap
    assert(got(1L) == 0L && got(2L) == 0L && got(4L) == 4L)
  }
}
