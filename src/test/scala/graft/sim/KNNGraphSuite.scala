package graft.sim

import graft.TestBase
import org.apache.spark.sql.functions._

class KNNGraphSuite extends TestBase {
  import spark.implicits._

  test("brute graph matches hand-computed edges, no self-edges") {
    // three clusters on the unit circle: each point's nearest is its
    // cluster partner, second-nearest the adjacent cluster
    val pts = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.99f, 0.01f)),
      (2L, Array(0.0f, 1.0f)), (3L, Array(0.01f, 0.99f)),
      (4L, Array(-1.0f, 0.0f)), (5L, Array(-0.99f, -0.01f)))
      .toDF("vec_id", "embedding")
    val edges = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(1).setBruteForce(true).transform(pts)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
      .as[(Long, Long)].collect().toSet
    assert(edges == Set((0L, 1L), (1L, 0L), (2L, 3L), (3L, 2L),
      (4L, 5L), (5L, 4L)))
  }

  test("exhaustive probing equals brute force edge-for-edge") {
    val emb = sfTable("embeddings").limit(300)
    val g = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(4).setNLists(8).setNProbe(8)
    val ivf = g.transform(emb)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
    val bf = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(4).setBruteForce(true).transform(emb)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
    assert(bf.except(ivf).isEmpty && ivf.except(bf).isEmpty)
  }

  test("partial probing keeps useful recall on real embeddings") {
    val emb = sfTable("embeddings").limit(300)
    val ivf = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(4).setNLists(8).setNProbe(4).transform(emb)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
    val bf = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(4).setBruteForce(true).transform(emb)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
    val hits = bf.join(ivf, Seq("query_id", "id"), "left_semi").count()
    val total = bf.count()
    assert(hits.toDouble / total >= 0.5,
      s"recall ${hits.toDouble / total} below floor at nProbe=4/8")
  }

  test("ivf mode plans a real equi-join by cell — nothing nested-loop") {
    // brute mode's all-pairs broadcast nested loop is its design (and
    // PlanSuite-exempted); the SCALE path must never degrade to it
    val emb = sfTable("embeddings").limit(300)
    val plan = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(4).setNLists(8).setNProbe(4).transform(emb)
      .queryExecution.executedPlan
    def flatten(p: org.apache.spark.sql.execution.SparkPlan):
        Seq[org.apache.spark.sql.execution.SparkPlan] =
      (p +: p.children.flatMap(flatten)) ++ p.subqueries.flatMap(flatten)
    val bad = flatten(plan).filter(n =>
      n.isInstanceOf[org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec] ||
      n.isInstanceOf[org.apache.spark.sql.execution.joins.CartesianProductExec])
    assert(bad.isEmpty, s"ivf-mode graph degenerated:\n$plan")
  }

  test("every node appears and has exactly k neighbors") {
    val emb = sfTable("embeddings").limit(200)
    val out = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
      .setK(3).setBruteForce(true).transform(emb)
    assert(out.count() == 200)
    assert(out.filter(size(col("neighbors")) =!= 3).count() == 0)
    assert(out.filter(exists(col("neighbors"),
      n => n("id") === col("query_id"))).count() == 0)
  }
}
