package graft.dedup

import graft.TestBase
import org.apache.spark.sql.functions._

class IncrementalSuite extends TestBase {
  import spark.implicits._

  lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "completely different content about database engines"),
    (2L, "a third curated document that is unique")
  ).toDF("doc_id", "text")

  // 10: exact copy of corpus 0 (whitespace/case variant); 11+12: in-batch
  // dup pair; 13: fresh
  lazy val batch = Seq(
    (10L, "THE QUICK  brown fox jumps over the lazy dog"),
    (11L, "a brand new page from this snapshot"),
    (12L, "a brand  NEW page from this snapshot"),
    (13L, "another genuinely fresh document")
  ).toDF("doc_id", "text")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  test("drops corpus duplicates, collapses in-batch groups, keeps fresh") {
    val out = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpus(corpus).transform(batch)
    assert(ids(out) == Seq(11L, 13L))
  }

  test("precomputed fingerprint index path is identical") {
    val idx = IncrementalDeduplicator.fingerprintIndex(corpus, "text")
    val out = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpusIndex(idx).transform(batch)
    assert(ids(out) == Seq(11L, 13L))
  }

  test("matches a from-scratch ExactDeduplicator over the union") {
    // corpus already deduped, ids below the batch's: full-rebuild result
    // restricted to batch ids must equal the incremental result
    val full = new ExactDeduplicator().setInputCol("text").setIdCol("doc_id")
      .transform(corpus.unionByName(batch))
    val fullBatchSide = ids(full.filter(col("doc_id") >= 10))
    val inc = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpus(corpus).transform(batch)
    assert(ids(inc) == fullBatchSide)
  }

  test("priority column picks the preferred in-batch copy") {
    val prioritized = batch.withColumn("prio",
      when(col("doc_id") === 12, 0).otherwise(1))
    val out = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setPriorityCol("prio")
      .setCorpus(corpus).transform(prioritized)
    assert(ids(out) == Seq(12L, 13L))
  }

  test("equivalence with full rebuild holds on a real corpus slice") {
    // the driver-gate shape at suite scale: corpus/batch split of the
    // sf0.001 documents plus planted copies; incremental must equal the
    // rebuild's batch side (corpus ids all smaller than batch ids after
    // the shift, so min-id keeps corpus copies)
    val docs = sfTable("documents").select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
      .select((col("doc_id") + 10000L).as("doc_id"), col("text"))
      .unionByName(docs.filter(col("doc_id") % 9 === 1)
        .select((col("doc_id") + 20000L).as("doc_id"), col("text")))
    val inc = ids(new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpus(corpus).transform(batch))
    val full = new ExactDeduplicator().setInputCol("text").setIdCol("doc_id")
      .transform(corpus.unionByName(batch))
    assert(inc == ids(full.filter(col("doc_id") >= 10000)))
  }

  test("surviving batch + old index reproduces next snapshot's index") {
    // steady state: index(t+1) = index(t) ∪ index(survivors). Running the
    // SAME batch against the updated index must drop everything.
    val idx0 = IncrementalDeduplicator.fingerprintIndex(corpus, "text")
    val survivors = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpusIndex(idx0).transform(batch)
    val idx1 = idx0
      .unionByName(IncrementalDeduplicator.fingerprintIndex(survivors, "text"))
      .distinct()
    val again = new IncrementalDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setCorpusIndex(idx1).transform(batch)
    assert(ids(again).isEmpty)
  }
}
