package graft.nn

import graft.TestBase
import org.apache.spark.sql.functions._
import scala.util.Random

class KNNSuite extends TestBase {
  import spark.implicits._

  test("BallTree matches brute force on random data") {
    val rnd = new Random(7)
    val points = Array.fill(500)(Array.fill(8)(rnd.nextDouble()))
    val ids = Array.tabulate(500)(_.toLong)
    val tree = new BallTree(points, ids, Array.empty, leafSize = 20)
    def dist(a: Array[Double], b: Array[Double]) =
      math.sqrt(a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum)
    (0 until 20).foreach { _ =>
      val q = Array.fill(8)(rnd.nextDouble())
      val brute = points.zip(ids).map { case (p, i) => (dist(q, p), i) }
        .sortBy(t => (t._1, t._2)).take(5).toSeq
      val fast = tree.search(q, 5)
      assert(fast.map(_._2) == brute.map(_._2),
        s"tree=${fast.mkString(",")} brute=${brute.mkString(",")}")
    }
  }

  test("BallTree conditional search restricts to allowed labels") {
    val points = Array.tabulate(100)(i => Array(i.toDouble))
    val ids = Array.tabulate(100)(_.toLong)
    val labels = Array.tabulate(100)(_ % 2)
    val tree = new BallTree(points, ids, labels, leafSize = 10)
    val res = tree.search(Array(50.0), 3, allowed = Set(1))
    assert(res.forall(r => r._2 % 2 == 1))
    assert(res.map(_._2).contains(51L))
  }

  test("KNN estimator end-to-end on embeddings") {
    val emb = sfTable("embeddings")
    val model = new KNN().setInputCol("embedding").setIdCol("vec_id").setK(3)
      .fit(emb)
    val out = model.transform(emb.limit(20))
    val rows = out.select(col("vec_id"), col("matches")).collect()
    rows.foreach { r =>
      val matches = r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](1)
      assert(matches.length == 3)
      // nearest neighbor of a corpus point is itself at distance 0
      assert(matches.head.getAs[Long]("id") == r.getAs[Long](0))
      assert(matches.head.getAs[Double]("distance") == 0.0)
    }
  }

  test("fit fails fast above maxCollectRows, naming the ANN scale path") {
    val emb = sfTable("embeddings")
    val e = intercept[IllegalArgumentException] {
      new KNN().setInputCol("embedding").setIdCol("vec_id")
        .setMaxCollectRows(10L).fit(emb)
    }
    assert(e.getMessage.contains("collect"))
    assert(e.getMessage.contains("LSHNearestNeighbors"))
    // at-bound corpus still fits
    val m = new KNN().setInputCol("embedding").setIdCol("vec_id").setK(2)
      .setMaxCollectRows(10L).fit(emb.limit(10))
    assert(m.transform(emb.limit(3)).count() == 3)
  }

  test("PartitionedKNN equals driver-collected ball-tree KNN exactly") {
    val emb = sfTable("embeddings")
    val queries = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 25)
    val collected = new KNN().setInputCol("embedding").setIdCol("vec_id")
      .setK(5).fit(emb).transform(queries)
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("matches"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).mkString(",")).toMap
    // corpus spread over many partitions — per-partition trees + merge
    val part = new PartitionedKNN().setInputCol("embedding").setIdCol("vec_id")
      .setK(5).setQueries(queries, "vec_id", "embedding")
      .transform(emb.repartition(11))
      .collect().map(r => r.getLong(0) -> r.getSeq[Any](1).mkString(",")).toMap
    assert(part.keySet == collected.keySet)
    collected.foreach { case (q, m) => assert(part(q) == m, s"query $q") }
  }

  test("PartitionedKNN is deterministic under distance ties at the k boundary") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 30 identical vectors: the only correct top-3 under (distance asc,
    // id asc) is ids 0,1,2 — regardless of partition layout or traversal
    // order (exercises the BallTree equal-distance smaller-id tie-break)
    val corpus = (0L until 30L).map(i => (i, Array(1.0, 2.0, 3.0)))
      .toDF("vec_id", "embedding")
    val q = Seq((100L, Array(1.0, 2.0, 3.0))).toDF("vec_id", "embedding")
    // sortWithinPartitions DESC pins a descending encounter order — the
    // exact case where a heap whose tied head is the SMALLEST id would
    // keep the last-encountered ids instead of {0,1,2}
    val out = new PartitionedKNN().setInputCol("embedding").setIdCol("vec_id")
      .setK(3).setQueries(q, "vec_id", "embedding")
      .transform(corpus.repartition(7)
        .sortWithinPartitions(col("vec_id").desc))
      .select(col("matches.id")).as[Seq[Long]].collect().head
    assert(out == Seq(0L, 1L, 2L))
  }

  test("BallTree keeps the (distance asc, id asc) k-set under any insertion order") {
    // 12 identical points fed in DESCENDING id order: with the heap's tie
    // ordering inverted (pre-round-11 bug) the kept set depends on
    // traversal order and comes back wrong
    val pts = Array.fill(12)(Array(1.0, 2.0))
    val ids = (0L until 12L).reverse.toArray
    val t = new BallTree(pts, ids, Array.empty, leafSize = 4)
    assert(t.search(Array(1.0, 2.0), 3).map(_._2) == Seq(0L, 1L, 2L))
    // mixed distances + ties at the k boundary: points at distance 1.0
    // (ids 20,21,22) and 2.0 (ids 10,11), k=4 must keep 20,21,22,10
    val pts2 = Array(Array(0.0, 1.0), Array(1.0, 0.0), Array(0.0, -1.0),
      Array(0.0, 2.0), Array(2.0, 0.0))
    val ids2 = Array(22L, 21L, 20L, 11L, 10L)
    val t2 = new BallTree(pts2, ids2, Array.empty, leafSize = 2)
    assert(t2.search(Array(0.0, 0.0), 4).map(_._2) == Seq(20L, 21L, 22L, 10L))
  }

  test("PartitionedKNN bounds the query broadcast, naming the knob") {
    val emb = sfTable("embeddings")
    val e = intercept[IllegalArgumentException] {
      new PartitionedKNN().setInputCol("embedding").setIdCol("vec_id")
        .setMaxQueryRows(3L).setQueries(emb.limit(10), "vec_id", "embedding")
        .transform(emb)
    }
    assert(e.getMessage.contains("MaxQueryRows"))
  }

  test("ConditionalKNN via labelCol + conditionerCol") {
    val emb = sfTable("embeddings")
    val model = new KNN().setInputCol("embedding").setIdCol("vec_id")
      .setLabelCol("label").setK(3).fit(emb)
    model.setConditionerCol("allowed")
    val out = model.transform(
      emb.limit(10).withColumn("allowed", array(lit(1), lit(2))))
    val labelOf = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    out.select("matches").collect().foreach { r =>
      r.getAs[scala.collection.Seq[org.apache.spark.sql.Row]](0).foreach { m =>
        assert(Set(1, 2).contains(labelOf(m.getAs[Long]("id"))))
      }
    }
  }
}
