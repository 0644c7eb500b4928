package graft.dedup

import graft.TestBase
import org.apache.spark.sql.functions._

class SemDeDupSuite extends TestBase {
  import spark.implicits._

  // two well-separated directions with planted near-dups inside each:
  // x-cluster {0: base, 1: tiny perturbation (cos ~0.9995)}, y-cluster
  // {2: base, 3: tiny perturbation}, plus 4: an x-cluster member far
  // enough to be no one's duplicate (cos ~0.86 to the base)
  lazy val vecs = Seq(
    (0L, Array(1.0, 0.02, 0.0, 0.0)),
    (1L, Array(1.0, 0.05, 0.0, 0.0)),
    (2L, Array(0.0, 0.02, 1.0, 0.0)),
    (3L, Array(0.0, 0.05, 1.0, 0.0)),
    (4L, Array(1.0, 0.55, 0.0, 0.0))
  ).toDF("vec_id", "embedding")

  private def ids(df: org.apache.spark.sql.DataFrame): Seq[Long] =
    df.select("vec_id").as[Long].collect().sorted.toSeq

  test("clustered SemDeDup removes planted within-cluster near-dups") {
    val out = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(2).setThreshold(0.99).setKeepRule("minId")
      .transform(vecs)
    // near-dup pairs (0,1) and (2,3) collapse to their min id; 4 survives
    assert(ids(out) == Seq(0L, 2L, 4L))
  }

  test("nClusters=1 equals exhaustive exact pairwise dedup") {
    val exhaustive = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setKeepRule("minId")
      .transform(vecs)
    // brute-force expectation computed in-frame
    val pairs = vecs.select(col("vec_id").as("l"), col("embedding").as("a"))
      .crossJoin(vecs.select(col("vec_id").as("r"), col("embedding").as("b")))
      .filter(col("l") < col("r"))
      .filter(graft.sim.SimilarityFunctions.cosine(col("a"), col("b")) >= 0.99)
    val dropped = pairs.select(col("r")).distinct().as[Long].collect().toSet
    val expected = ids(vecs).filterNot(dropped)
    assert(ids(exhaustive) == expected)
  }

  test("centroidFar keep rule retains the cluster-atypical copy") {
    // single cluster pulled toward y by vec 9: of the near-dup pair
    // (5, 1), vec 1 sits closer to the centroid direction, so the
    // paper's rule keeps 5 (higher id!) where minId would keep 1
    val skew = Seq(
      (5L, Array(1.0, 0.30, 0.0, 0.0)),
      (1L, Array(1.0, 0.36, 0.0, 0.0)),
      (9L, Array(0.3, 1.0, 0.0, 0.0))
    ).toDF("vec_id", "embedding")
    val far = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setKeepRule("centroidFar")
      .transform(skew)
    assert(ids(far) == Seq(5L, 9L))
    val min = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setKeepRule("minId")
      .transform(skew)
    assert(ids(min) == Seq(1L, 9L))
  }

  test("deterministic across runs and partitionings") {
    val corpus = sfTable("embeddings")
    val op = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(8).setThreshold(0.465)
    val a = ids(op.transform(corpus))
    val b = ids(op.transform(corpus.repartition(7)))
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("clustered result equals exhaustive on planted near-exact dups") {
    // 8 well-separated direction clusters, 25 members each (intra-cluster
    // cos ~0.8, far from threshold), every 5th member duplicated with
    // ~1e-3 perturbation (cos ~0.99999). A near-exact dup pair lands on
    // the same side of ANY centroid boundary, so the clustered result
    // must match the exhaustive one exactly — regardless of which
    // partition k-means found.
    val rnd = new scala.util.Random(7)
    def unit(v: Array[Double]) = {
      val n = math.sqrt(v.map(x => x * x).sum); v.map(_ / n)
    }
    val centers = Array.fill(8)(unit(Array.fill(64)(rnd.nextGaussian())))
    val rows = scala.collection.mutable.ArrayBuffer[(Long, Array[Double])]()
    var id = 0L
    for (c <- centers; i <- 0 until 25) {
      val p = unit(centers.indexOf(c).toLong.## match { case _ =>
        c.zip(Array.fill(64)(rnd.nextGaussian() * 0.5 / 8)).map(t => t._1 + t._2)
      })
      rows += ((id, p)); id += 1
      if (i % 5 == 0) {
        val dup = unit(p.zip(Array.fill(64)(rnd.nextGaussian() * 1e-3 / 8))
          .map(t => t._1 + t._2))
        rows += ((id, dup)); id += 1
      }
    }
    val corpus = rows.toSeq.toDF("vec_id", "embedding")
    val approx = ids(new SemDeDup().setInputCol("embedding")
      .setIdCol("vec_id").setNClusters(8).setThreshold(0.99)
      .setKeepRule("minId").transform(corpus))
    val exact = ids(new SemDeDup().setInputCol("embedding")
      .setIdCol("vec_id").setNClusters(1).setThreshold(0.99)
      .setKeepRule("minId").setMaxClusterSize(4096).transform(corpus))
    assert(approx == exact)
    // and the planted dups really were removed
    assert(exact.size == rows.size - 8 * 5)
  }

  test("auto cluster count scales with the corpus and still finds dups") {
    // 500-vector fixture at target 64 -> k=8; planted near-exact dups
    // are clustering-robust, so auto-k must remove them all
    val corpus = sfTable("embeddings")
    val auto = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(0).setTargetClusterSize(64).setThreshold(0.465)
      .setKeepRule("minId")
    val exact = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.465).setKeepRule("minId")
      .setMaxClusterSize(4096)
    // auto can only keep MORE (cross-cluster pairs unseen), never fewer
    val a = ids(auto.transform(corpus)).toSet
    val e = ids(exact.transform(corpus)).toSet
    assert(e.subsetOf(a))
    // the cap respects maxAutoClusters
    val capped = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(0).setTargetClusterSize(2).setMaxAutoClusters(4)
      .setThreshold(0.465).setKeepRule("minId")
    assert(ids(capped.transform(corpus)).nonEmpty)
  }

  test("two-level quantizer path (k > 64) finds the same planted dups") {
    // target 4 on 500 vectors -> k=125 > TwoLevelAbove -> hierarchical
    // training/assignment; near-exact dups co-assign under ANY quantizer,
    // so the exhaustive survivor set must still be a subset
    val corpus = sfTable("embeddings")
    val two = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(0).setTargetClusterSize(4).setThreshold(0.465)
      .setKeepRule("minId")
    val a = ids(two.transform(corpus))
    val b = ids(two.transform(corpus.repartition(5)))
    assert(a == b, "two-level path must stay deterministic")
    val exact = ids(new SemDeDup().setInputCol("embedding")
      .setIdCol("vec_id").setNClusters(1).setThreshold(0.465)
      .setKeepRule("minId").setMaxClusterSize(4096).transform(corpus))
    assert(exact.toSet.subsetOf(a.toSet))
  }

  test("null embeddings survive; zero-norm pairs keep Spark NaN semantics") {
    // null: no vector to compare -> never a candidate, row kept (was an
    // opaque NPE before round 16). zero-norm: cosine against ANYTHING is
    // NaN, and Spark comparison semantics order NaN above every number,
    // so a zero-norm vector collapses against whatever shares its
    // cluster — the grouped verify must mirror the expression-based
    // filter it replaced (here ids 6 and 7 both fold into id 0).
    val df = Seq(
      (0L, Array(1.0, 0.02, 0.0, 0.0)),
      (1L, Array(1.0, 0.05, 0.0, 0.0)),            // near-dup of 0
      (5L, null.asInstanceOf[Array[Double]]),       // survives untouched
      (6L, Array(0.0, 0.0, 0.0, 0.0)),              // zero-norm ->
      (7L, Array(0.0, 0.0, 0.0, 0.0)))              //   NaN vs everything
      .toDF("vec_id", "embedding")
    val out = ids(new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setKeepRule("minId")
      .transform(df))
    assert(out == Seq(0L, 5L), s"got $out")
  }

  test("maxClusterSize cap degrades gracefully, never errors") {
    val out = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setMaxClusterSize(2)
      .setKeepRule("minId").transform(vecs)
    // with a 2-id cap only {0,1} form a candidate pair; 3 escapes the cap
    assert(ids(out).contains(0L) && ids(out).contains(2L))
  }

  test("nClusters=1 with the DEFAULT cap auto-raises past the 2048 " +
    "population: exhaustive stays exact (round-17 advice)") {
    import spark.implicits._
    // 2100 near-identical vectors (> the 2048 default cap): with a
    // fixed cap the overflow would escape candidacy and survive; the
    // single-cell auto-raise compares every pair -> one survivor
    val big = (0 until 2100)
      .map(i => (i.toLong, Array(1.0, 0.0001 * (i % 3), 0.0)))
      .toDF("vec_id", "embedding")
    val out = new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
      .setNClusters(1).setThreshold(0.99).setKeepRule("minId")
      .transform(big)
    assert(out.count() == 1)
  }

  test("transformSchema validates idCol/inputCol and reserved __dup_id " +
    "(fail-fast, named errors)") {
    val e1 = intercept[IllegalArgumentException] {
      new SemDeDup().setInputCol("embedding").setIdCol("nope")
        .transform(vecs)
    }
    assert(e1.getMessage.contains("idCol 'nope' not found"))
    val e2 = intercept[IllegalArgumentException] {
      new SemDeDup().setInputCol("embedding").setIdCol("vec_id")
        .transform(vecs.withColumn("__dup_id", lit(1)))
    }
    assert(e2.getMessage.contains("__dup_id"))
  }
}
