package graft.text

import graft.TestBase

class GopherQualityFilterSuite extends TestBase {
  import spark.implicits._

  /** 60 distinct 4-6 char words + four stop words: passes every rule */
  private def body(seed: Int): String =
    (1 to 60).map(i => s"wrd${(seed * 31 + i) % 97}").mkString(" ") +
      " the and of that"

  private def survivors(texts: (Long, String)*): Set[Long] = {
    val df = texts.toSeq.toDF("doc_id", "text")
    new GopherQualityFilter().setInputCol("text").transform(df)
      .select("doc_id").as[Long].collect().toSet
  }

  test("a clean document passes; each Table-A1 rule rejects alone") {
    val phrase6 =
      "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu " * 6
    val bullets = (1 to 30).map(j => s"•filler item$j").mkString("\n")
    val ellipsis = (1 to 5).map(j => s"more to come $j...").mkString("\n")
    val dupLines = List.fill(8)("repeated filler line here").mkString("\n")
    val got = survivors(
      1L -> body(1),                                   // pass
      2L -> "tiny doc the and",                        // word count < 50
      3L -> (1 to 60).map(i => s"wrd${(3 * 31 + i) % 97}")
        .mkString(" "),                                // no stop words
      4L -> (body(4) + " " + phrase6),                 // dup n-grams
      5L -> (body(5) + "\n" + bullets),                // bullet lines > 0.9
      6L -> (body(6) + " ### ### ### ### ### ### ### ### ### ###"),
      7L -> (body(7) + "\n" + ellipsis),               // ellipsis lines > 0.3
      8L -> (body(8) + "\n" + dupLines),               // duplicate lines
      9L -> ((1 to 60).map(i =>
        s"${('a' + i % 26).toChar}${('a' + i / 26).toChar}")
        .mkString(" ") + " the and of that"))          // mean word len < 3
    assert(got == Set(1L))
  }

  test("thresholds are params: tightening maxWords rejects the clean doc") {
    val df = Seq((1L, body(1))).toDF("doc_id", "text")
    val strict = new GopherQualityFilter().setInputCol("text")
      .setMaxWords(10L)
    assert(strict.transform(df).count() == 0)
    // a long stop-free doc passes once minStopWords is relaxed
    val noStops = (1 to 60).map(i => s"wrd${(7 * 31 + i) % 97}")
      .mkString(" ")
    val lax = new GopherQualityFilter().setInputCol("text")
      .setMinStopWords(0)
    assert(lax.transform(df.withColumn("text",
      org.apache.spark.sql.functions.lit(noStops))).count() == 1)
  }

  test("keepSignals exposes all 28 signal columns; default drops them") {
    val df = Seq((1L, body(1))).toDF("doc_id", "text")
    val f = new GopherQualityFilter().setInputCol("text")
    assert(f.transform(df).columns.toSeq == Seq("doc_id", "text"))
    val audited = f.setKeepSignals(true).transform(df)
    assert(f.signalColumns.forall(audited.columns.contains))
    val r = audited.select("gq_stop_words", "gq_mean_word_len_q4")
      .as[(Long, Long)].head()
    assert(r._1 == 4)                  // the, and, of, that
    assert(r._2 >= 30000 && r._2 <= 100000)
  }

  test("null and empty text never survive (word count gate)") {
    val df = Seq((1L, null: String), (2L, ""), (3L, "   "))
      .toDF("doc_id", "text")
    assert(new GopherQualityFilter().setInputCol("text")
      .transform(df).count() == 0)
  }
}
