package graft.sim

import graft.TestBase
import org.apache.spark.sql.functions._

class IVFPQSuite extends TestBase {
  import spark.implicits._

  private def ids(df: org.apache.spark.sql.DataFrame) = df
    .select(col("query_id"), col("neighbors.id").as("ids"))
    .as[(Long, Seq[Long])].collect().toMap

  test("IVFPQ with exhaustive probe + full re-rank equals brute force") {
    val emb = sfTable("embeddings")
    val n = emb.count().toInt
    val queries = emb.filter(col("vec_id") < 5)
    val brute = ids(new NearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(3).setQueries(queries, "vec_id", "embedding")
      .transform(emb))
    val pq = new IVFPQNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(8).setNumSub(8).setNBits(4).fit(emb)
    // every cell probed and every candidate exactly re-ranked: the PQ
    // approximation cannot change the answer
    val full = ids(pq.setK(3).setNProbe(8).setRerankK(n)
      .setQueries(queries, "vec_id", "embedding").transform(emb))
    assert(full == brute)
  }

  private def recallAt5(emb: org.apache.spark.sql.DataFrame,
      queries: org.apache.spark.sql.DataFrame,
      nLists: Int, nProbe: Int, rerankK: Int): Double = {
    val brute = ids(new NearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(5).setQueries(queries, "vec_id", "embedding")
      .transform(emb))
    val pq = new IVFPQNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(nLists).setNumSub(8).setNBits(8).fit(emb)
    val approx = ids(pq.setK(5).setNProbe(nProbe).setRerankK(rerankK)
      .setQueries(queries, "vec_id", "embedding").transform(emb))
    val hits = brute.map { case (q, bs) =>
      bs.toSet.intersect(approx.getOrElse(q, Nil).toSet).size }.sum
    hits.toDouble / brute.values.map(_.size).sum
  }

  test("IVFPQ recall@5 >= 0.9 on a clustered corpus at a lean budget") {
    // PQ's contract regime: embeddings with neighborhood structure
    // (near-dup clusters — the training-data use case). 50 centers x 12
    // members, sigma small vs inter-center distance; probe 4/16 cells
    // and re-rank only 30 of 600 — both budgets a real deployment uses
    val rnd = new scala.util.Random(5)
    val centers = Array.fill(50)(Array.fill(32)(rnd.nextGaussian()))
    val rows = (0 until 600).map { i =>
      val c = centers(i % 50)
      (i.toLong, c.map(_ + rnd.nextGaussian() * 0.15))
    }
    val emb = rows.toDF("vec_id", "embedding")
    val queries = emb.filter(col("vec_id") < 20)
    val r = recallAt5(emb, queries, nLists = 16, nProbe = 4, rerankK = 30)
    info(f"IVFPQ clustered recall@5 = $r%.3f (probe 4/16, rerank 30/600)")
    assert(r >= 0.9, f"IVFPQ clustered recall@5 $r%.3f < 0.9")
  }

  test("IVFPQ isotropic worst case keeps a sane recall floor") {
    // the sf embeddings are near-unclustered gaussians — distance
    // concentration makes this PQ's worst regime (quantization error is
    // comparable to the neighbor gaps). The floor pins against silent
    // total breakage (bad codebooks, ADC table off-by-one) without
    // pretending worst-case data gives operating-point recall
    val emb = sfTable("embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val r = recallAt5(emb, queries, nLists = 8, nProbe = 8, rerankK = 50)
    info(f"IVFPQ isotropic recall@5 = $r%.3f (full probe, rerank 50/500)")
    assert(r >= 0.6, f"IVFPQ isotropic recall@5 $r%.3f < 0.6")
  }

  test("PQ codes compress the scan: numSub bytes per vector") {
    val emb = sfTable("embeddings")
    val pq = new IVFPQNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(4).setNumSub(8).setNBits(4).fit(emb)
    assert(pq.codebooks.length == 8)
    assert(pq.codebooks.forall(_.length <= 16)) // 2^4
    // subspace bounds tile [0, dim) exactly, uneven dims included
    val bounds = (0 until 8).map(IVFPQ.subRange(61, 8, _))
    assert(bounds.head._1 == 0 && bounds.last._2 == 61)
    assert(bounds.sliding(2).forall(p => p(0)._2 == p(1)._1))
  }
}
