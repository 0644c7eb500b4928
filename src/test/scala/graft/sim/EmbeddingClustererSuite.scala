package graft.sim

import graft.TestBase
import org.apache.spark.sql.functions._

class EmbeddingClustererSuite extends TestBase {
  import spark.implicits._

  // 3 planted orthogonal directions, 20 docs each, tiny deterministic
  // jitter — spherical k-means must recover the partition exactly
  private def planted = spark.range(60)
    .select(col("id").as("doc_id"),
      array((0 until 4).map(d =>
        when(col("id") % 3 === d, lit(10.0))
          .otherwise(pmod(col("id") * (d + 7), lit(13)).cast("double") / 100.0)
      ): _*).as("emb"))

  private def fitModel = new EmbeddingClusterer()
    .setInputCol("emb").setIdCol("doc_id").setK(3).setSeed(7L)
    .fit(planted)

  test("recovers a planted partition exactly (canonicalized labels)") {
    val assigned = fitModel.transform(planted)
    // canonicalize k-means' arbitrary labels by each cluster's min doc_id
    val rep = assigned.groupBy("cluster").agg(min("doc_id").as("rep"))
    val got = assigned.join(rep, "cluster")
      .select("doc_id", "rep").as[(Long, Long)].collect().toMap
    (0L until 60L).foreach { id =>
      assert(got(id) == id % 3, s"doc $id landed with rep ${got(id)}")
    }
  }

  test("assignment is direction-only (spherical): scaling never moves a doc") {
    val m = fitModel
    val scaled = planted.withColumn("emb",
      transform(col("emb"), x => x * (pmod(col("doc_id"), lit(5)) + 1)))
    val a = m.transform(planted).select("doc_id", "cluster")
    val b = m.transform(scaled).select("doc_id", "cluster")
    assertDFEq(a, b)
  }

  test("null embeddings and null elements get a null cluster") {
    val m = fitModel
    val withNulls = planted
      .withColumn("emb", when(col("doc_id") === 0L, lit(null)
          .cast("array<double>"))
        .when(col("doc_id") === 1L,
          array(lit(1.0), lit(null).cast("double"), lit(0.0), lit(0.0)))
        .otherwise(col("emb")))
    val got = m.transform(withNulls)
      .select("doc_id", "cluster")
      .as[(Long, Option[Int])].collect().toMap
    assert(got(0L).isEmpty && got(1L).isEmpty)
    assert(got(2L).isDefined)
  }

  test("centroid_sim_q4 is near 1.0 for tight planted clusters") {
    val sims = fitModel.transform(planted)
      .select("centroid_sim_q4").as[Long].collect()
    assert(sims.forall(s => s > 9900 && s <= 10000), sims.take(5).toSeq)
  }

  test("deterministic across partitionings; save/load assigns identically") {
    val m = fitModel
    val a = m.transform(planted.repartition(7)).select("doc_id", "cluster",
      "centroid_sim_q4")
    val b = m.transform(planted.coalesce(1)).select("doc_id", "cluster",
      "centroid_sim_q4")
    assertDFEq(a, b)
    val dir = java.nio.file.Files.createTempDirectory("ecsl").toString
    m.write.overwrite().save(dir)
    val back = EmbeddingClustererModel.load(dir)
    assertDFEq(a, back.transform(planted).select("doc_id", "cluster",
      "centroid_sim_q4"))
  }

  test("prototypicality pruning composes: drop the most centroid-hugging " +
      "half per cluster (SSL-prototypes rule, Sorscher et al. 2022)") {
    val assigned = fitModel.transform(planted)
      // keep the LEAST prototypical: rank by negated centroid similarity
      .withColumn("atypicality", -col("centroid_sim_q4"))
    val kept = new graft.text.ScoreSelector().setScoreCol("atypicality")
      .setIdCol("doc_id").setFraction(0.5).setMode("exact")
      .setPartitionCol("cluster").transform(assigned)
    val perCluster = kept.groupBy("cluster").count()
      .select("count").as[Long].collect()
    assert(perCluster.forall(_ == 10), perCluster.toSeq) // ceil(20 * 0.5)
    // within every cluster, each survivor is no more prototypical than
    // every dropped doc (ties broken by id, so compare with tolerance 0)
    val keptIds = kept.select("doc_id").as[Long].collect().toSet
    val all = assigned.select("doc_id", "cluster", "centroid_sim_q4")
      .as[(Long, Int, Long)].collect()
    all.groupBy(_._2).foreach { case (_, docs) =>
      val (k, d) = docs.partition(x => keptIds.contains(x._1))
      assert(k.map(_._3).max <= d.map(_._3).min + 1,
        "a kept doc hugs the centroid tighter than a dropped one")
    }
  }

  test("output-column clash fails at transformSchema") {
    intercept[IllegalArgumentException] {
      fitModel.transformSchema(
        planted.withColumn("cluster", lit(1)).schema)
    }
  }
}
