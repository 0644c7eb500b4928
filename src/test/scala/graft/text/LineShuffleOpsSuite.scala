package graft.text
// (WithinDocLineDeduplicator tests live at the bottom of this suite)

import graft.TestBase
import org.apache.spark.sql.functions._

class LineShuffleOpsSuite extends TestBase {
  import spark.implicits._

  test("LineDeduplicator removes corpus-repeated lines, keeps the rest") {
    val docs = Seq(
      (1L, "alpha body one\ncookie banner\nunique tail 1"),
      (2L, "beta body two\ncookie banner\nunique tail 2"),
      (3L, "gamma body three\n  cookie banner  \nunique tail 3"), // trims
      (4L, "delta\ndelta\nunique tail 4"), // self-repeated line
      (5L, ""))
      .toDF("doc_id", "text")
    val got = new LineDeduplicator().setInputCol("text")
      .transform(docs)
      .select("doc_id", "ld_n_lines", "ld_n_dup_lines", "ld_text")
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 3L, 1L, "alpha body one\nunique tail 1")))
    assert(got(2L) == ((2L, 3L, 1L, "beta body two\nunique tail 2")))
    // trimmed matching: "  cookie banner  " is the same boilerplate
    assert(got(3L) == ((3L, 3L, 1L, "gamma body three\nunique tail 3")))
    // within-doc repetition counts toward the corpus threshold
    assert(got(4L) == ((4L, 3L, 2L, "unique tail 4")))
    assert(got(5L) == ((5L, 0L, 0L, "")))
  }

  test("LineDeduplicator scopeCol + countDocsOnce: site-scoped document frequency") {
    val docs = Seq(
      // nav line repeats across site A's docs -> removed from A only
      (1L, "a.com", "nav menu\nbody one"),
      (2L, "a.com", "nav menu\nbody two"),
      // the SAME line on an unrelated site, once -> kept there
      (3L, "b.com", "nav menu\nbody three"),
      // repeated only WITHIN one doc: docs-once keeps both copies
      (4L, "b.com", "echo\necho\nbody four"),
      // null scope groups with empty-string scope
      (5L, null, "shared-null\nbody five"),
      (6L, "", "shared-null\nbody six"))
      .toDF("doc_id", "site", "text")
    val got = new LineDeduplicator().setInputCol("text")
      .setScopeCol("site").setCountDocsOnce(true)
      .transform(docs)
      .select("doc_id", "ld_n_dup_lines", "ld_text")
      .as[(Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 1L, "body one")))
    assert(got(2L) == ((2L, 1L, "body two")))
    assert(got(3L) == ((3L, 0L, "nav menu\nbody three")))
    assert(got(4L) == ((4L, 0L, "echo\necho\nbody four")))
    assert(got(5L) == ((5L, 1L, "body five")))
    assert(got(6L) == ((6L, 1L, "body six")))
    // raw-occurrence counting (docs-once off) kills the in-doc repeat
    val raw = new LineDeduplicator().setInputCol("text")
      .setScopeCol("site")
      .transform(docs)
      .select("doc_id", "ld_text").as[(Long, String)].collect().toMap
    assert(raw(4L) == "body four")
    // unknown scope column fails loudly
    val e = intercept[IllegalArgumentException] {
      new LineDeduplicator().setInputCol("text").setScopeCol("nope")
        .transform(docs)
    }
    assert(e.getMessage.contains("nope"))
  }

  test("LineDeduplicator is partitioning-independent") {
    val docs = (0L until 60L).map(i =>
      (i, s"head $i\nshared-${i % 4}\ntail $i")).toDF("doc_id", "text")
    def run(df: org.apache.spark.sql.DataFrame) =
      new LineDeduplicator().setInputCol("text").transform(df)
        .select("doc_id", "ld_n_dup_lines", "ld_text")
        .as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("LineDeduplicator use128BitKeys matches the 64-bit path exactly") {
    // the fingerprint-pair key is a collision-probability upgrade, not a
    // semantics change: on any collision-free corpus (i.e. every corpus
    // at test scale) the two key widths must agree byte-for-byte across
    // scope/docs-once combinations
    val docs = (0L until 80L).map { i =>
      val site = s"s${i % 5}.com"
      (i, site, s"head $i\nshared-${i % 4}\nsite-of-${i % 5}\ntail $i")
    }.toDF("doc_id", "site", "text")
    def run(wide: Boolean, scoped: Boolean, docsOnce: Boolean) = {
      val ld = new LineDeduplicator().setInputCol("text")
        .setUse128BitKeys(wide).setCountDocsOnce(docsOnce)
      (if (scoped) ld.setScopeCol("site") else ld).transform(docs)
        .select("doc_id", "ld_n_lines", "ld_n_dup_lines", "ld_text")
        .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    }
    for (scoped <- Seq(false, true); docsOnce <- Seq(false, true)) {
      assert(run(wide = true, scoped, docsOnce) ==
        run(wide = false, scoped, docsOnce), s"($scoped, $docsOnce)")
    }
    // and the wide path does remove the planted boilerplate
    val wide = run(wide = true, scoped = true, docsOnce = true)
    assert(wide.forall(_._3 >= 2L)) // shared-{i%4} + site-of-{i%5} lines
  }

  test("CorpusShuffler assigns a dense deterministic permutation") {
    val df = (0L until 100L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val a = new CorpusShuffler().setIdCol("doc_id").transform(df)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    // dense 0..n-1, every id present
    assert(a.values.toSeq.sorted == (0L until 100L))
    assert(a.keySet == (0L until 100L).toSet)
    // deterministic across partitionings
    val b = new CorpusShuffler().setIdCol("doc_id")
      .transform(df.repartition(13))
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a == b)
    // a different seed gives a different permutation
    val c = new CorpusShuffler().setIdCol("doc_id").setSeed("7")
      .transform(df)
      .select("doc_id", "shuffle_pos").as[(Long, Long)].collect().toMap
    assert(a != c)
    // and the order is exactly md5(id || ':' || seed) asc
    val want = (0L until 100L).sortBy { i =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8"))
      d.map("%02x".format(_)).mkString
    }.zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(a == want)
  }

  test("CorpusShuffler keeps schema order and non-numeric ids") {
    // the narrow-sort retrofit joins the position back by id — column
    // order, id typing, and payload fidelity must survive the join
    val df = Seq(("idB", "x", 1), ("idA", "y", 2), ("idC", "z", 3))
      .toDF("doc_id", "text", "k")
    val out = new CorpusShuffler().setIdCol("doc_id").transform(df)
    assert(out.columns.toSeq == Seq("doc_id", "text", "k", "shuffle_pos"))
    val got = out.select("doc_id", "text", "k", "shuffle_pos")
      .as[(String, String, Int, Long)].collect().sortBy(_._1)
    assert(got.map(r => (r._1, r._2, r._3)).toSeq ==
      Seq(("idA", "y", 2), ("idB", "x", 1), ("idC", "z", 3)))
    val want = Seq("idA", "idB", "idC").sortBy { i =>
      java.security.MessageDigest.getInstance("MD5")
        .digest(s"$i:42".getBytes("UTF-8")).map("%02x".format(_)).mkString
    }.zipWithIndex.map { case (id, p) => id -> p.toLong }.toMap
    assert(got.map(r => r._1 -> r._4).toMap == want)
  }

  test("CorpusShuffler fails loudly on a NULL id and dodges __cs_id collisions") {
    // a NULL id can never equi-join its position back — the row would
    // silently vanish from the shuffled corpus
    val bad = Seq((java.lang.Long.valueOf(1L), "a"),
      (null.asInstanceOf[java.lang.Long], "b")).toDF("doc_id", "text")
    val e = intercept[org.apache.spark.SparkException] {
      new CorpusShuffler().setIdCol("doc_id").transform(bad).count()
    }
    def all(t: Throwable): String =
      if (t == null) "" else t.getMessage + all(t.getCause)
    assert(all(e).contains("NULL doc_id"))
    // a user column named __cs_id must not collide with the temp column
    val tricky = Seq((1L, "x", "u1"), (2L, "y", "u2"))
      .toDF("doc_id", "text", "__cs_id")
    val out = new CorpusShuffler().setIdCol("doc_id").transform(tricky)
    assert(out.columns.toSeq ==
      Seq("doc_id", "text", "__cs_id", "shuffle_pos"))
    assert(out.select("__cs_id").as[String].collect().toSet ==
      Set("u1", "u2"))
  }

  test("WithinDocLineDeduplicator keeps first occurrences in order") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nbody two\nnav\nfooter"),
      (2L, "only\nunique\nlines"),
      (3L, "")
    ).toDF("doc_id", "page")
    val out = new WithinDocLineDeduplicator().setInputCol("page")
      .setOutputCol("clean").transform(df)
      .select("doc_id", "clean").as[(Long, String)].collect().toMap
    assert(out(1L) == "nav\nbody one\nbody two\nfooter")
    assert(out(2L) == "only\nunique\nlines")
    assert(out(3L) == "")
  }

  test("WithinDocLineDeduplicator custom delimiter and collision guard") {
    val df = Seq((1L, "a|b|a|c")).toDF("doc_id", "page")
    val out = new WithinDocLineDeduplicator().setInputCol("page")
      .setOutputCol("clean").setDelimiter("|").transform(df)
      .select("clean").as[String].head()
    assert(out == "a|b|c")
    intercept[IllegalArgumentException] {
      new WithinDocLineDeduplicator().setInputCol("page")
        .setOutputCol("page").transform(df)
    }
  }
}
