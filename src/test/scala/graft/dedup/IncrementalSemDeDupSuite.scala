package graft.dedup

import graft.TestBase
import org.apache.spark.sql.functions._

/** The semantic incremental (snapshot-delta) face: corpus-vs-batch
  * decisions off the persisted quantizer + embedding index, the
  * corpus-always-survives rule, within-batch chaining, persistence of
  * the cell partition, and null handling. */
class IncrementalSemDeDupSuite extends TestBase {
  import spark.implicits._

  // the SemDeDupSuite geometry: two well-separated directions; corpus
  // holds a base vector of each, the batch carries near-dups of them
  // plus one genuinely novel direction and one batch-internal near-pair
  lazy val corpus = Seq(
    (0L, Array(1.0, 0.02, 0.0, 0.0)),
    (1L, Array(0.0, 0.02, 1.0, 0.0))
  ).toDF("doc_id", "embedding")
  lazy val batch = Seq(
    (10L, Array(1.0, 0.05, 0.0, 0.0)),  // near-dup of corpus 0 -> drop
    (11L, Array(0.0, 0.05, 1.0, 0.0)),  // near-dup of corpus 1 -> drop
    (12L, Array(0.0, 0.0, 0.0, 1.0)),   // novel direction -> keep
    (13L, Array(0.0, 0.01, 0.0, 1.0)),  // near-dup of 12 (in-batch) -> drop
    (14L, null.asInstanceOf[Array[Double]]) // no evidence -> keep
  ).toDF("doc_id", "embedding")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("doc_id").as[Long].collect().sorted.toSeq

  test("exhaustive batch-vs-corpus: corpus survives, batch near-dups " +
    "drop, within-batch pass chains") {
    val m = new IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(1).setThreshold(0.99).fit(corpus)
    val out = m.setCorpusIndex(m.indexCorpus(corpus))
      .setWithinBatchClusters(1)
      .transform(batch)
    assert(ids(out) == Seq(12L, 14L))
    // corpus rows were never part of the batch output — the corpus
    // copy survives in the CORPUS, the batch sheds its duplicates
  }

  test("dedupWithinBatch=false keeps batch-internal near-pairs") {
    val m = new IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(1).setThreshold(0.99).fit(corpus)
    val out = m.setCorpusIndex(m.indexCorpus(corpus))
      .setDedupWithinBatch(false)
      .transform(batch)
    assert(ids(out) == Seq(12L, 13L, 14L))
  }

  test("the persisted quantizer pins the cell partition: save/load " +
    "assigns and decides identically") {
    val many = (0 until 300).map { i =>
      val base = Array.fill(8)(0.0)
      base(i % 4) = 1.0; base((i % 4 + 1) % 8) = 0.01 * (i % 7)
      (i.toLong, base)
    }.toDF("doc_id", "embedding")
    val m = new IncrementalSemDeDup().setInputCol("embedding")
      .setTargetClusterSize(64).fit(many)
    val dir = java.nio.file.Files
      .createTempDirectory("graft_isd").toString + "/m"
    m.write.overwrite().save(dir)
    val back = IncrementalSemDeDupModel.load(dir)
    val idx = m.indexCorpus(many)
      .select("__id", "__cell").as[(Long, Int)].collect().sorted.toSeq
    val idx2 = back.indexCorpus(many)
      .select("__id", "__cell").as[(Long, Int)].collect().sorted.toSeq
    assert(idx == idx2)
    val a = ids(m.setCorpusIndex(m.indexCorpus(many)).transform(batch))
    val b = ids(back.setCorpusIndex(back.indexCorpus(many)).transform(batch))
    assert(a == b)
  }

  test("SemDeDup on an empty or all-null frame returns it unchanged " +
    "(regression: crashed in the quantizer fit)") {
    val allNull = Seq((1L, null.asInstanceOf[Array[Double]]),
      (2L, null.asInstanceOf[Array[Double]])).toDF("doc_id", "embedding")
    val sd = new SemDeDup().setInputCol("embedding").setIdCol("doc_id")
    assert(ids(sd.transform(allNull)) == Seq(1L, 2L))
    assert(sd.transform(allNull.limit(0)).count() == 0)
  }

  test("null corpus embeddings never enter the index; fit fails fast " +
    "on an all-null corpus") {
    val withNull = corpus.unionByName(
      Seq((2L, null.asInstanceOf[Array[Double]]))
        .toDF("doc_id", "embedding"))
    val m = new IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(1).setThreshold(0.99).fit(withNull)
    assert(m.indexCorpus(withNull).count() == 2)
    val e = intercept[IllegalArgumentException] {
      new IncrementalSemDeDup().setInputCol("embedding").fit(
        Seq((1L, null.asInstanceOf[Array[Double]]))
          .toDF("doc_id", "embedding"))
    }
    assert(e.getMessage.contains("no non-null"))
  }

  test("clustered mode agrees with exhaustive on well-separated planted " +
    "geometry") {
    val m1 = new IncrementalSemDeDup().setInputCol("embedding")
      .setNClusters(2).setThreshold(0.99).fit(corpus)
    val out = m1.setCorpusIndex(m1.indexCorpus(corpus))
      .setWithinBatchClusters(1)
      .transform(batch)
    assert(ids(out) == Seq(12L, 14L))
  }
}
