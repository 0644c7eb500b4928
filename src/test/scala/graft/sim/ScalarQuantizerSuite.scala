package graft.sim

import graft.TestBase
import org.apache.spark.sql.functions._

class ScalarQuantizerSuite extends TestBase {
  import spark.implicits._

  private lazy val emb = sfTable("embeddings")

  test("codes stay in [0,255] and range ends hit exactly 0 and 255") {
    val df = Seq(
      (1L, Array(0.0f, 10.0f)),
      (2L, Array(1.0f, -10.0f)),
      (3L, Array(0.5f, 0.0f))).toDF("vec_id", "embedding")
    val m = new ScalarQuantizer().setInputCol("embedding").fit(df)
    val codes = m.transform(df).orderBy("vec_id")
      .select("codes").as[Seq[Int]].collect()
    assert(codes(0) == Seq(0, 255)) // per-dim min -> 0, max -> 255
    assert(codes(1) == Seq(255, 0))
    assert(codes(2)(0) == 128) // 0.5 of the range: floor(127.5+0.5)
  }

  test("zero-range dimension encodes to 0 and dequantizes to the constant") {
    val df = Seq((1L, Array(3.0f, 1.0f)), (2L, Array(3.0f, 2.0f)))
      .toDF("vec_id", "embedding")
    val m = new ScalarQuantizer().setInputCol("embedding").fit(df)
    val out = m.transform(df)
    assert(out.select("codes").as[Seq[Int]].collect().forall(_.head == 0))
    val dq = out.select(m.dequantize(col("codes"))).as[Seq[Double]].head()
    assert(dq.head == 3.0)
  }

  test("reconstruction error is bounded by one quantization cell") {
    val m = new ScalarQuantizer().setInputCol("embedding").fit(emb)
    val maxCell = m.mins.indices
      .map(i => (m.maxs(i) - m.mins(i)) / 255.0).max
    val worst = m.transform(emb)
      .select(explode(zip_with(m.dequantize(col("codes")),
        col("embedding").cast("array<double>"),
        (a, b) => abs(a - b))).as("e"))
      .agg(max(col("e"))).head().getDouble(0)
    assert(worst <= maxCell * 0.5 + 1e-12,
      s"worst error $worst exceeds half-cell $maxCell")
  }

  test("top-k recall through quantized vectors stays high on real embeddings") {
    val m = new ScalarQuantizer().setInputCol("embedding").fit(emb)
    val dq = m.transform(emb)
      .select(col("vec_id"), m.dequantize(col("codes")).as("embedding"))
    def top(df: org.apache.spark.sql.DataFrame) = {
      val g = new KNNGraph().setInputCol("embedding").setIdCol("vec_id")
        .setK(5).setBruteForce(true)
        .transform(df.limit(300))
        .select(col("query_id"), explode(col("neighbors.id")).as("id"))
      g
    }
    val bf = top(emb.select(col("vec_id"),
      col("embedding").cast("array<double>").as("embedding")))
    val q = top(dq)
    val hits = bf.join(q, Seq("query_id", "id"), "left_semi").count()
    val recall = hits.toDouble / bf.count()
    assert(recall >= 0.9, s"SQ8 recall $recall below 0.9")
  }

  test("model save/load preserves bounds and codes") {
    val m = new ScalarQuantizer().setInputCol("embedding").fit(emb)
    val p = java.nio.file.Files.createTempDirectory("sq8").toString + "/m"
    m.write.overwrite().save(p)
    val loaded = ScalarQuantizerModel.load(p)
    assert(loaded.mins.sameElements(m.mins) && loaded.maxs.sameElements(m.maxs))
    assertDFEq(m.transform(emb).select("vec_id", "codes"),
      loaded.transform(emb).select("vec_id", "codes"))
  }
}
