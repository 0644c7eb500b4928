package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class SoftDedupSuite extends TestBase {
  import spark.implicits._

  // 3-grams; docs 1 and 2 share "a b c" (df=2), everything else unique
  private def fixture = Seq(
    (1L, "a b c d"), // grams: "a b c"(df2), "b c d"(df1)
    (2L, "x a b c"), // grams: "x a b"(df1), "a b c"(df2)
    (3L, "p q r"), // one unique gram
    (4L, "one two"), // too short for a 3-gram
    (5L, null.asInstanceOf[String]))
    .toDF("doc_id", "text")

  private def stats(mode: String) = new SoftDeduplicator()
    .setInputCol("text").setIdCol("doc_id").setN(3).setMode(mode)
    .transform(fixture)
    .select("doc_id", "sd_n_grams", "sd_sum_df", "sd_commonness", "sd_weight")
    .as[(Long, Long, Long, Double, Double)]
    .collect().map(r => r._1 -> r).toMap

  test("exact mode: df counts, geometric-mean weight, short/null docs weigh 1") {
    val got = stats("exact")
    assert(got(1L)._2 == 2L && got(1L)._3 == 3L) // dfs {2,1}
    assert(got(2L)._2 == 2L && got(2L)._3 == 3L)
    assert(got(3L)._2 == 1L && got(3L)._3 == 1L)
    // commonness(1) = mean(ln 1, ln 2) = ln(2)/2; weight = 2^-0.5
    assert(math.abs(got(1L)._4 - math.log(2.0) / 2) < 1e-12)
    assert(math.abs(got(1L)._5 - math.exp(-math.log(2.0) / 2)) < 1e-12)
    assert(got(3L)._4 == 0.0 && got(3L)._5 == 1.0) // all-unique doc
    assert(got(4L) == ((4L, 0L, 0L, 0.0, 1.0))) // no gram evidence
    assert(got(5L) == ((5L, 0L, 0L, 0.0, 1.0))) // null text
  }

  test("lambda sharpens the downweighting: weight = geomean(df)^-lambda") {
    val w2 = new SoftDeduplicator().setInputCol("text").setIdCol("doc_id")
      .setN(3).setLambda(2.0).transform(fixture)
      .where($"doc_id" === 1L).select("sd_weight").as[Double].head()
    assert(math.abs(w2 - math.exp(-2.0 * math.log(2.0) / 2)) < 1e-12)
  }

  test("sketch mode matches exact on a collision-free fixture") {
    assert(stats("sketch") == stats("exact"))
  }

  test("sketch never underestimates df: weights <= exact, integers >= exact") {
    // tiny width forces collisions; CMS only overestimates
    val docs = sfTable("documents").select("doc_id", "text").limit(60)
    def byId(m: String, w: Int) = new SoftDeduplicator().setInputCol("text")
      .setIdCol("doc_id").setN(3).setMode(m).setSketchWidth(w)
      .transform(docs)
      .select("doc_id", "sd_n_grams", "sd_sum_df", "sd_weight")
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val ex = byId("exact", 64)
    val sk = byId("sketch", 64)
    assert(ex.keySet == sk.keySet)
    var collided = false
    ex.keys.foreach { id =>
      assert(sk(id)._2 == ex(id)._2) // gram count never changes
      assert(sk(id)._3 >= ex(id)._3)
      assert(sk(id)._4 <= ex(id)._4 + 1e-12)
      if (sk(id)._3 > ex(id)._3) collided = true
    }
    assert(collided, "width-64 sketch on real text should collide somewhere")
  }

  test("partitioning independence (commonness folds in sorted order)") {
    val docs = sfTable("documents").select("doc_id", "text").limit(80)
    def run(parts: Int) = new SoftDeduplicator().setInputCol("text")
      .setIdCol("doc_id").transform(docs.repartition(parts))
      .select("doc_id", "sd_n_grams", "sd_sum_df", "sd_commonness",
        "sd_weight")
    assertDFEq(run(1), run(7))
  }

  test("hash64 helper replays Spark's xxhash64 column bit-for-bit") {
    val vals = Seq("a b c", "", "naïve café", "多字节 字符").toDF("s")
      .select($"s", xxhash64($"s").as("h")).as[(String, Long)].collect()
    vals.foreach { case (s, h) =>
      assert(SoftDeduplicator.hash64(s) == h, s"mismatch for '$s'")
    }
  }

  test("output-column clash fails at transformSchema; save/load round-trips") {
    val sd = new SoftDeduplicator().setInputCol("text")
    intercept[IllegalArgumentException] {
      sd.transformSchema(fixture.withColumn("sd_weight", lit(1.0)).schema)
    }
    val dir = java.nio.file.Files.createTempDirectory("sdsl").toString
    sd.setN(4).setLambda(0.5).setMode("sketch").write.overwrite().save(dir)
    val back = SoftDeduplicator.load(dir)
    assert(back.getN == 4 && back.getLambda == 0.5 && back.getMode == "sketch")
  }
}
