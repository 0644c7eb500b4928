package graft.dedup

import graft.TestBase
import org.apache.spark.sql.functions._

class IncrementalMinHashSuite extends TestBase {
  import spark.implicits._

  lazy val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the river bank today"),
    (1L, "completely different content about database engines and query planners"),
    (2L, "a third curated document that is entirely unique in every way")
  ).toDF("doc_id", "text")

  // 10: near-dup of corpus 0 (one word changed, Jaccard ~0.71 at k=2);
  // 11+12: in-batch near-dup pair; 13: fresh
  lazy val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy cat near the river bank today"),
    (11L, "a brand new page from this snapshot with plenty of words to shingle"),
    (12L, "a brand new page from this snapshot with plenty of words to mingle"),
    (13L, "another genuinely fresh document with nothing shared at all")
  ).toDF("doc_id", "text")

  private def op(mode: String) = new IncrementalMinHashDeduplicator()
    .setInputCol("text").setIdCol("doc_id").setShingleSize(2)
    .setNumHashes(128).setBands(32).setThreshold(0.6).setVerifyMode(mode)

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  test("exact mode: corpus near-dups drop, in-batch pair collapses") {
    val out = op("exact").setCorpus(corpus).transform(batch)
    assert(ids(out) == Seq(11L, 13L))
  }

  test("signature mode from the index alone agrees on clear margins") {
    val idx = IncrementalMinHashDeduplicator.signatureIndex(
      corpus, "doc_id", "text", 2, 128)
    val out = op("signature").setCorpusIndex(idx).transform(batch)
    assert(ids(out) == Seq(11L, 13L))
  }

  test("signature mode from raw corpus equals index path") {
    val viaRaw = op("signature").setCorpus(corpus).transform(batch)
    val idx = IncrementalMinHashDeduplicator.signatureIndex(
      corpus, "doc_id", "text", 2, 128)
    val viaIdx = op("signature").setCorpusIndex(idx).transform(batch)
    assertDFEq(viaRaw, viaIdx)
  }

  test("a clean batch passes through untouched") {
    val clean = Seq(
      (20L, "some words that exist nowhere else in any corpus fixture"),
      (21L, "yet another disjoint sentence carrying no shared shingles"))
      .toDF("doc_id", "text")
    assert(ids(op("exact").setCorpus(corpus).transform(clean)) ==
      Seq(20L, 21L))
    assert(ids(op("signature").setCorpus(corpus).transform(clean)) ==
      Seq(20L, 21L))
  }

  test("over-threshold candidate count falls back to shuffle joins") {
    // the broadcast hints on the candidate/drop id frames are gated on
    // the MEASURED candidate count (the frames carry no stats): above
    // broadcastMaxCandidates no join may carry a broadcast HINT — the
    // strategy is the planner's again (a huge high-dup-rate delta could
    // otherwise push a forced broadcast past Spark's 8 GB cap; AQE
    // re-broadcasting a frame it MEASURED as tiny at runtime stays
    // legitimate and is why the assertion reads the optimized plan's
    // hints, not the executed strategy) and the result must be
    // unchanged.
    val plans = scala.collection.mutable.ArrayBuffer.empty[String]
    val l = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        plans.synchronized { plans += qe.optimizedPlan.toString }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      def antiJoinPlans(): Seq[String] = {
        org.apache.spark.graftshims.ListenerBridge
          .waitUntilEmpty(spark.sparkContext, 5000)
        val p = plans.synchronized { val s = plans.toSeq; plans.clear(); s }
        p.filter(_.contains("LeftAnti"))
      }
      val small = op("exact").setCorpus(corpus)
        .setBroadcastMaxCandidates(0L).transform(batch)
      val overPlans = antiJoinPlans()
      assert(overPlans.nonEmpty, "expected the survivor anti-join to run")
      assert(!overPlans.exists(_.contains("strategy=broadcast")),
        "over-threshold path must not hint a broadcast")
      val default = op("exact").setCorpus(corpus).transform(batch)
      val underPlans = antiJoinPlans()
      assert(underPlans.exists(_.contains("strategy=broadcast")),
        "under-threshold path should keep the broadcast hint")
      assert(ids(small) == Seq(11L, 13L) && ids(default) == Seq(11L, 13L),
        "fallback must not change decisions")
    } finally spark.listenerManager.unregister(l)
  }

  test("matches a from-scratch MinHashDeduplicator over the union") {
    // corpus already near-deduped with smaller ids: a full rebuild's
    // batch-side survivors must equal the incremental (exact-mode) result
    val full = new MinHashDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setShingleSize(2).setNumHashes(128).setBands(32)
      .setThreshold(0.6).transform(corpus.unionByName(batch))
    val fullBatch = ids(full.filter(col("doc_id") >= 10))
    val inc = op("exact").setCorpus(corpus).transform(batch)
    assert(ids(inc) == fullBatch)
  }
}
