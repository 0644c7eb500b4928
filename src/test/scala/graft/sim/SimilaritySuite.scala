// (IVF tests appended below the existing suite)
package graft.sim

import graft.TestBase
import org.apache.spark.sql.functions._

class SimilaritySuite extends TestBase {
  import spark.implicits._

  lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f)),
    (1L, Array(0.0f, 1.0f)),
    (2L, Array(1.0f, 1.0f)),
    (3L, Array(-1.0f, 0.0f)),
    (4L, Array(0.9f, 0.1f))
  ).toDF("vec_id", "embedding")

  test("cosine / dot / l2 expressions") {
    val df = Seq((Array(1.0f, 2.0f), Array(3.0f, 4.0f))).toDF("a", "b")
    assert(df.select(SimilarityFunctions.dot(col("a"), col("b")))
      .as[Double].head() == 11.0)
    assert(math.abs(df.select(SimilarityFunctions.l2Norm(col("a")))
      .as[Double].head() - math.sqrt(5)) < 1e-12)
    val cos = df.select(SimilarityFunctions.cosine(col("a"), col("b")))
      .as[Double].head()
    assert(math.abs(cos - 11.0 / (math.sqrt(5) * 5)) < 1e-12)
    assert(math.abs(df.select(SimilarityFunctions.l2Distance(col("a"), col("b")))
      .as[Double].head() - math.sqrt(8)) < 1e-12)
  }

  test("NearestNeighbors brute-force returns exact top-k order") {
    val queries = vecs.filter(col("vec_id") === 0L)
    val out = new NearestNeighbors().setInputCol("embedding").setIdCol("vec_id")
      .setK(3).setQueries(queries, "vec_id", "embedding")
      .transform(vecs)
    val neighbors = out.select(col("neighbors.id")).as[Seq[Long]].head()
    // cos(0,0)=1 > cos(0,4)=~0.994 > cos(0,2)=0.707
    assert(neighbors == Seq(0L, 4L, 2L))
  }

  test("LSHNearestNeighbors finds the identical vector") {
    val queries = vecs.filter(col("vec_id") === 0L)
    val out = new LSHNearestNeighbors().setInputCol("embedding").setIdCol("vec_id")
      .setK(2).setQueries(queries, "vec_id", "embedding")
      .transform(vecs)
    val neighbors = out.select(col("neighbors.id")).as[Seq[Long]].head()
    assert(neighbors.head == 0L) // self always shares every bucket
  }

  test("TopKAggregator keeps k best with deterministic tie-break") {
    val agg = new TopKAggregator(2)
    val r = agg.merge(
      agg.reduce(agg.reduce(agg.zero, Scored(0.5, 10)), Scored(0.9, 3)),
      agg.reduce(agg.zero, Scored(0.9, 1)))
    assert(agg.finish(r) == Seq(Scored(0.9, 1), Scored(0.9, 3)))
  }

  test("IVF ANN recalls brute-force neighbors with full probing") {
    val emb = sfTable("embeddings")
    val queries = emb.filter(col("vec_id") < 5)
    val brute = new NearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(3).setQueries(queries, "vec_id", "embedding")
      .transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val ivf: IVFNearestNeighborsModel = new IVFNearestNeighbors()
      .setInputCol("embedding").setIdCol("vec_id").setNLists(8).fit(emb)
    // nProbe == nLists => exhaustive => must equal brute force
    val full = ivf.setK(3).setNProbe(8)
      .setQueries(queries, "vec_id", "embedding").transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(full == brute)
    // partial probing still finds the identical vector (its own cell)
    val partial = ivf.setNProbe(1)
      .setQueries(queries, "vec_id", "embedding").transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    partial.foreach { case (q, ids) => assert(ids.head == q) }
  }

  test("TopKAggregator equals reference top-k under random merge trees") {
    // the aggregator must be insensitive to how Spark partitions and
    // merges partial buffers: for random inputs, random merge trees, and
    // heavy score/id ties, the result must equal the oracle computed from
    // the flat list under the (score desc, id asc, distinct id) order
    val rnd = new scala.util.Random(271828)
    for (trial <- 0 until 200) {
      val k = 1 + rnd.nextInt(6)
      val agg = new TopKAggregator(k)
      val n = rnd.nextInt(40)
      // small value domains force ties and duplicate ids
      val xs = Vector.fill(n)(Scored((rnd.nextInt(5) * 0.5), rnd.nextInt(12).toLong))
      def reference(s: Seq[Scored]): Seq[Scored] =
        s.sortBy(x => (-x.score, x.id)).distinctBy(_.id).take(k)
      // random merge tree: split the input into random runs, reduce each,
      // then merge in random order
      def build(items: Seq[Scored]): Seq[Scored] =
        if (items.isEmpty) agg.zero
        else if (items.length == 1 || rnd.nextBoolean())
          items.foldLeft(agg.zero)(agg.reduce)
        else {
          val split = 1 + rnd.nextInt(items.length - 1)
          val (a, b) = items.splitAt(split)
          agg.merge(build(a), build(b))
        }
      val got = agg.finish(build(xs))
      assert(got == reference(xs),
        s"trial $trial k=$k xs=$xs got=$got want=${reference(xs)}")
    }
  }

  test("ANN recall@5 >= 0.9 vs brute force at the driver operating points") {
    // the regression gate the approximate paths were missing: a silent
    // drop to near-zero recall (bad banding, broken bucket join, top-k
    // crowd-out) fails here even though row counts stay plausible
    val emb = sfTable("embeddings")
    val queries = emb.filter(col("vec_id") < 20)
    val brute = new NearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(5).setQueries(queries, "vec_id", "embedding")
      .transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    def recall(approx: Map[Long, Seq[Long]]): Double = {
      val hits = brute.map { case (q, ids) =>
        ids.toSet.intersect(approx.getOrElse(q, Nil).toSet).size }.sum
      hits.toDouble / brute.values.map(_.size).sum
    }
    val lsh = new LSHNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(5) // the knn_lsh operating point (2-bit bands)
      .setNumPlanes(16).setBands(8)
      .setQueries(queries, "vec_id", "embedding").transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val lshRecall = recall(lsh)
    assert(lshRecall >= 0.9, s"LSH recall@5 regressed: $lshRecall")
    // knn_ivf operating point: 8 cells / 6 probes — the minimum probe
    // count whose worst-case recall over quantizer seeds clears 0.9 on
    // this near-unclustered fixture (measured 0.92 min / 0.94 median
    // across 10 seeds; 4 probes spans 0.79-0.90 and only passed by seed
    // luck before)
    val ivf = new IVFNearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setNLists(8).fit(emb)
      .setK(5).setNProbe(6).setQueries(queries, "vec_id", "embedding")
      .transform(emb)
      .select(col("query_id"), col("neighbors.id").as("ids"))
      .as[(Long, Seq[Long])].collect().toMap
    val ivfRecall = recall(ivf)
    assert(ivfRecall >= 0.9, s"IVF recall@5 regressed: $ivfRecall")
  }

  test("knn_lsh_recall fixture margin: every true neighbor shares sign bits") {
    // The driver gate knn_lsh_recall encodes FULL recall at 1-bit banding
    // (16 planes / 16 bands, seed 42) as an exact-constant oracle: a
    // (query, neighbor) pair is missed only if ALL 16 sign bits differ.
    // Planes and fixture are both fixed, so the gate is deterministic —
    // but only safely so while the fixture keeps every brute-force top-5
    // pair MARGINED off the all-bits-differ cliff. Assert >= 2 agreeing
    // bits per pair (missing a pair needs 0), so a fixture regeneration
    // that lands a pair at the edge reddens here before the driver gate
    // starts flipping.
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    val queries = emb.filter(col("vec_id") < 20)
    val dim = emb.select(size(col("embedding"))).head().getInt(0)
    val planes = SimilarityFunctions.randomPlanes(16, dim, 42L)
    val pairs = new NearestNeighbors().setInputCol("embedding")
      .setIdCol("vec_id").setK(5).setQueries(queries, "vec_id", "embedding")
      .transform(emb)
      .select(col("query_id"), explode(col("neighbors.id")).as("id"))
    val sigs = emb.select(col("vec_id").cast("long").as("sid"),
      SimilarityFunctions.hyperplaneSignature(col("embedding"), planes)
        .as("sig"))
    val minAgree = pairs
      .join(sigs.withColumnRenamed("sid", "query_id")
        .withColumnRenamed("sig", "qsig"), Seq("query_id"))
      .join(sigs.withColumnRenamed("sid", "id")
        .withColumnRenamed("sig", "nsig"), Seq("id"))
      .select((lit(16) - bit_count(col("qsig").bitwiseXOR(col("nsig"))
        .bitwiseAND(lit(0xFFFFL)))).as("agree"))
      .agg(min(col("agree"))).head().getInt(0)
    assert(minAgree >= 2,
      s"a brute-force neighbor pair agrees on only $minAgree/16 sign " +
        "bits — the knn_lsh_recall full-recall gate is no longer margined")
  }

  test("EmbeddingMeanPooler pools exact per-dimension means") {
    val df = Seq(
      ("a", Array(1.0f, 2.0f)), ("a", Array(3.0f, 6.0f)),
      ("b", Array(10.0f, 20.0f))
    ).toDF("g", "emb").repartition(5)
    val out = new EmbeddingMeanPooler().setInputCol("emb")
      .setGroupCols(Array("g")).setOutputCol("pooled")
      .transform(df)
      .as[(String, Seq[Double])].collect().toMap
    assert(out("a") == Seq(2.0, 4.0))
    assert(out("b") == Seq(10.0, 20.0))
  }
}
