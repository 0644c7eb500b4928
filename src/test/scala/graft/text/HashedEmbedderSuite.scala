package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class HashedEmbedderSuite extends TestBase {
  import spark.implicits._

  private def emb(df: org.apache.spark.sql.DataFrame,
      e: HashedEmbedder = new HashedEmbedder()) =
    e.setInputCol("text").transform(df)
      .select("doc_id", "embedding")
      .as[(Long, Option[Seq[Float]])].collect().toMap

  test("deterministic unit vectors; shared tokens raise cosine") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox naps under the lazy dog"), // near-dup
      (3L, "completely unrelated bytes of other material here"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val got = emb(docs)
    def norm(v: Seq[Float]) = math.sqrt(v.map(x => x * x.toDouble).sum)
    def cos(a: Seq[Float], b: Seq[Float]) =
      a.zip(b).map { case (x, y) => x * y.toDouble }.sum
    assert(got(4L).isEmpty)
    Seq(1L, 2L, 3L).foreach { i =>
      assert(got(i).get.length == 64)
      assert(math.abs(norm(got(i).get) - 1.0) < 1e-6)
    }
    val near = cos(got(1L).get, got(2L).get)
    val far = cos(got(1L).get, got(3L).get)
    assert(near > far,
      s"near-dup cosine $near should beat unrelated $far")
    assert(near > 0.5, s"7-of-9 shared tokens only scored $near")
    // pure function + partitioning independence
    assert(emb(docs.repartition(5)).view.mapValues(_.map(_.toSeq)).toMap ==
      got.view.mapValues(_.map(_.toSeq)).toMap)
  }

  test("salt draws an independent projection; weighting modes differ") {
    val docs = Seq((1L, "alpha beta beta gamma")).toDF("doc_id", "text")
    val a = emb(docs)(1L).get
    val b = emb(docs, new HashedEmbedder().setSalt("other"))(1L).get
    assert(a != b)
    val count = emb(docs, new HashedEmbedder().setNormalize(false))(1L).get
    val binary = emb(docs, new HashedEmbedder().setNormalize(false)
      .setTfWeighting("binary"))(1L).get
    // count weighting: exact integers, beta contributes 2
    assert(count.forall(v => v == math.rint(v)))
    assert(count != binary)
    // empty text: a well-defined all-zero vector, norm guard at 0
    val z = emb(Seq((1L, "   ")).toDF("doc_id", "text"))(1L).get
    assert(z.forall(_ == 0.0f))
  }

  test("dim is capped at md5's 128 sign bits; plans with zero exchange") {
    intercept[IllegalArgumentException] {
      new HashedEmbedder().setDim(129)
    }
    val plan = new HashedEmbedder().setInputCol("text")
      .transform(Seq((1L, "a b")).toDF("doc_id", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
    // dim 128 uses every digest bit
    val full = emb(Seq((1L, "a b c")).toDF("doc_id", "text"),
      new HashedEmbedder().setDim(128))(1L).get
    assert(full.length == 128)
  }

  test("packed sign bits match the hex-char reference arithmetic") {
    // signBits packs the digest into two longs; the SQL oracle replays
    // the hex-char/shift form — they must agree on every bit
    (Seq("the", "a", "你好", "😀x", "") ++
      (1 to 50).map(i => s"tok$i")).foreach { t =>
      val hex = HashedEmbedder.md5Hex(t + ":e15")
      val w = HashedEmbedder.signBits(t + ":e15")
      (0 until 128).foreach { j =>
        val ref = (Character.digit(hex.charAt(j >> 2), 16)
          >> (3 - (j & 3))) & 1
        val packed = ((w(j >> 6) >>> (63 - (j & 63))) & 1L).toInt
        assert(packed == ref, s"token '$t' bit $j")
      }
    }
  }

  test("closes the loop: documents -> HashedEmbedder -> SemDeDup") {
    // no external model anywhere: near-duplicate pages collapse under
    // semantic dedup over the library's own embeddings
    val base = "the quick brown fox jumps over the lazy dog again and again"
    val docs = Seq(
      (0L, base),
      (1L, base + " today"),                         // near-dup of 0
      (2L, "tax filing deadlines for small business owners this year"),
      (3L, "tax filing deadlines for most small business owners this year"),
      (4L, "completely different material about orbital mechanics"))
      .toDF("doc_id", "text")
    val withE = new HashedEmbedder().setInputCol("text").setDim(128)
      .transform(docs)
    val kept = new graft.dedup.SemDeDup().setInputCol("embedding")
      .setIdCol("doc_id").setNClusters(1).setThreshold(0.9)
      .setKeepRule("minId").transform(withE)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(kept == Seq(0L, 2L, 4L), s"kept $kept")
  }

  test("lowercasing is the SIMPLE per-codepoint mapping, like SQL lower()") {
    // full JVM String.toLowerCase maps final 'Σ' -> 'ς' and 'İ' -> "i̇"
    // (context-sensitive/expanding); engine lower() applies the simple
    // codepoint map — the embedder must match the oracle's mapping
    assert(HashedEmbedder.simpleLower("ΟΔΟΣ") == "οδοσ")
    assert(HashedEmbedder.simpleLower("İ") == "i̇".take(1) ||
      HashedEmbedder.simpleLower("İ").length == 1) // single codepoint out
    assert(HashedEmbedder.simpleLower("MiXeD ascii") == "mixed ascii")
    // fast path: already-lower ASCII returns the same instance
    val s = "already lower"
    assert(HashedEmbedder.simpleLower(s) eq s)
    // tokens therefore hash identically to the simple-lowered form
    val e1 = emb(Seq((1L, "ΟΔΟΣ")).toDF("doc_id", "text"),
      new HashedEmbedder().setNormalize(false))(1L).get
    val e2 = emb(Seq((1L, "οδοσ")).toDF("doc_id", "text"),
      new HashedEmbedder().setNormalize(false))(1L).get
    assert(e1 == e2)
  }

  test("transformSchema fails on an output-column clash") {
    val e = intercept[IllegalArgumentException] {
      new HashedEmbedder().setInputCol("text").setOutputCol("text")
        .transformSchema(Seq((1L, "a")).toDF("doc_id", "text").schema)
    }
    assert(e.getMessage.contains("already has a column"))
  }

  test("feeds the embedding consumers end-to-end (MLPScorer)") {
    val docs = Seq((1L, "some page text"), (2L, "other page text"))
      .toDF("doc_id", "text")
    val withE = new HashedEmbedder().setInputCol("text").transform(docs)
    val d = 64
    val head = Seq(graft.nn.DenseLayer(
      Array.tabulate(1, d)((_, j) => if (j % 2 == 0) 0.5 else -0.5),
      Array(0.0)))
    val scored = new graft.nn.MLPScorer().setInputCol("embedding")
      .setLayers(head).transform(withE)
    assert(scored.select("mlp_score").as[Double].collect().length == 2)
  }
}
