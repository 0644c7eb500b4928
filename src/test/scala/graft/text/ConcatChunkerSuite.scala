package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class ConcatChunkerSuite extends TestBase {
  import spark.implicits._

  private def chunked(df: org.apache.spark.sql.DataFrame, c: Int) =
    new ConcatChunker().setInputCol("text").setIdCol("doc_id")
      .setContextLen(c).transform(df)

  lazy val docs = sfTable("documents").select("doc_id", "text")

  test("pieces tile the token stream exactly") {
    val out = chunked(docs, 128).cache()
    try {
      val totalTokens = docs
        .select(sum(size(UnigramLM.tokens(col("text")))).cast("long"))
        .head().getLong(0)
      // piece lengths sum to the corpus token count
      val covered = out.select(sum(col("tok_end") - col("tok_start")))
        .head().getLong(0)
      assert(covered == totalTokens)
      // every window except the last carries exactly contextLen tokens
      val windows = out.groupBy("chunk_id")
        .agg(sum(col("tok_end") - col("tok_start")).as("w"))
        .orderBy("chunk_id").collect()
      assert(windows.map(_.getLong(0)).sameElements(
        windows.indices.map(_.toLong)), "chunk ids must be contiguous from 0")
      windows.dropRight(1).foreach(r => assert(r.getLong(1) == 128L))
      assert(windows.last.getLong(1) <= 128L)
      // pieces sit inside their window in global coordinates
      val misplaced = out.filter(
        col("tok_offset") + col("tok_start") < col("chunk_id") * 128 ||
        col("tok_offset") + col("tok_end") > (col("chunk_id") + 1) * 128)
        .count()
      assert(misplaced == 0)
      // per doc, pieces cover [0, n) contiguously
      val gaps = out.groupBy("doc_id")
        .agg(min("tok_start").as("s"), max("tok_end").as("e"),
          sum(col("tok_end") - col("tok_start")).as("len"))
        .filter(col("s") =!= 0 || col("e") =!= col("len")).count()
      assert(gaps == 0)
    } finally out.unpersist()
  }

  test("deterministic and partitioning-independent") {
    val a = chunked(docs, 256)
    val b = chunked(docs.repartition(7), 256)
    assertDFEq(a, b)
  }

  test("empty documents emit no pieces; seed changes the order") {
    val mixed = Seq((1L, "three tokens here"), (2L, "   "), (3L, "a b"))
      .toDF("doc_id", "text")
    val out = chunked(mixed, 4)
    assert(out.filter(col("doc_id") === 2).count() == 0)
    assert(out.select(sum(col("tok_end") - col("tok_start")))
      .head().getLong(0) == 5L)
    val s1 = new ConcatChunker().setInputCol("text").setIdCol("doc_id")
      .setContextLen(4).setSeed("a").transform(docs)
      .select("doc_id", "tok_offset")
    val s2 = new ConcatChunker().setInputCol("text").setIdCol("doc_id")
      .setContextLen(4).setSeed("b").transform(docs)
      .select("doc_id", "tok_offset")
    assert(s1.exceptAll(s2).count() > 0, "different seeds, different order")
  }

  test("lengthCol chunks in BPE units — the recipe composes end-to-end") {
    val bpe = new BPETokenizer().setInputCol("text").setNumMerges(100)
      .setMaxWordTypes(1024).fit(docs)
    val enc = bpe.transform(docs)
    val out = new ConcatChunker().setInputCol("text").setIdCol("doc_id")
      .setContextLen(64).setLengthCol("bpe_n_tokens").transform(enc).cache()
    try {
      // windows tile the BPE token stream, not the whitespace one
      val totalBpe = enc.select(sum("bpe_n_tokens")).head().getLong(0)
      val covered = out.select(sum(col("tok_end") - col("tok_start")))
        .head().getLong(0)
      assert(covered == totalBpe)
      val windows = out.groupBy("chunk_id")
        .agg(sum(col("tok_end") - col("tok_start")).as("w"))
        .orderBy("chunk_id").collect()
      windows.dropRight(1).foreach(r => assert(r.getLong(1) == 64L))
      // per-doc coverage equals the doc's OWN bpe count
      val bad = out.groupBy("doc_id")
        .agg(sum(col("tok_end") - col("tok_start")).as("got"))
        .join(enc.select(col("doc_id"), col("bpe_n_tokens")), "doc_id")
        .filter(col("got") =!= col("bpe_n_tokens")).count()
      assert(bad == 0)
      // exact replay: offsets are the cumulative bpe counts in
      // md5(id:seed) order — independently recomputed here
      val counts = enc.select(col("doc_id"), col("bpe_n_tokens"),
          md5(concat(col("doc_id").cast("string"), lit(":42"))).as("h"))
        .orderBy(col("h"), col("doc_id"))
        .select("doc_id", "bpe_n_tokens").as[(Long, Long)].collect()
      val want = counts.scanLeft((0L, 0L, 0L)) { case ((_, _, cum), (id, n)) =>
        (id, n, cum + n)
      }.drop(1).map { case (id, n, cumEnd) => id -> (cumEnd - n) }.toMap
      val gotOffsets = out.select("doc_id", "tok_offset").distinct()
        .as[(Long, Long)].collect().toMap
      assert(gotOffsets == want.filter { case (id, _) =>
        gotOffsets.contains(id) })
      // only empty docs may be absent from the chunk output
      val absent = want.keySet -- gotOffsets.keySet
      val emptyIds = enc.filter(col("bpe_n_tokens") === 0)
        .select("doc_id").as[Long].collect().toSet
      assert(absent.subsetOf(emptyIds))
    } finally out.unpersist()
  }

  test("a long document spans multiple whole windows") {
    val one = Seq((7L, Seq.fill(10)("w").mkString(" "))).toDF("doc_id", "text")
    val out = chunked(one, 3).orderBy("chunk_id")
      .select("chunk_id", "tok_start", "tok_end")
      .as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 0L, 3L), (1L, 3L, 6L), (2L, 6L, 9L),
      (3L, 9L, 10L)))
  }
}
