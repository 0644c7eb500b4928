package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class SequencePackerSuite extends TestBase {
  import spark.implicits._

  // token lengths: 4, 4, 3, 9, 2, 12, 1 (whitespace tokens)
  lazy val docs = Seq(
    (0L, "a b c d"),
    (1L, "e f g h"),
    (2L, "i j k"),
    (3L, "one two three four five six seven eight nine"),
    (4L, "x y"),
    (5L, "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"),
    (6L, "z")
  ).toDF("doc_id", "text")

  test("greedy first-fit packing in id order, hand-computed") {
    val out = new SequencePacker().setInputCol("text").setIdCol("doc_id")
      .setMaxTokens(10)
      .transform(docs)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    // budget 10: [4,4] fits (8), +3 would be 11 -> bin1 [3], +9 -> bin2 [9],
    // +2 -> bin3? 9+2=11 -> bin3 [2], 12 oversize alone -> bin4, 1 -> bin5?
    // acc=12 full so 12+1>10 -> bin5 [1]
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("sequences never cross groups; ids restart per group") {
    val grouped = docs.withColumn("dom",
      when(col("doc_id") < 3, "a").otherwise("b"))
    val out = new SequencePacker().setInputCol("text").setIdCol("doc_id")
      .setMaxTokens(10).setGroupCol("dom")
      .transform(grouped)
      .select("dom", "doc_id", "seq_id").as[(String, Long, Long)]
      .collect().map(t => (t._2, (t._1, t._3))).toMap
    // group a: lens 4,4,3 -> bins 0,0,1
    // group b: 9,2,12,1 -> 0 (9), 1 (9+2>10), 2 (oversize 12), 3 (12+1>10)
    assert(out == Map(0L -> ("a", 0L), 1L -> ("a", 0L), 2L -> ("a", 1L),
      3L -> ("b", 0L), 4L -> ("b", 1L), 5L -> ("b", 2L), 6L -> ("b", 3L)))
  }

  test("packing is independent of input partitioning") {
    def run(d: org.apache.spark.sql.DataFrame) =
      new SequencePacker().setInputCol("text").setIdCol("doc_id")
        .setMaxTokens(10).setNumShards(3)
        .transform(d)
        .select("doc_id", "seq_shard", "seq_id").as[(Long, Int, Long)]
        .collect().sorted.toSeq
    assert(run(docs.repartition(7)) == run(docs.coalesce(1)))
  }

  test("every sequence fits the budget unless it is a single oversize doc") {
    val corpus = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val packed = new SequencePacker().setInputCol("text").setIdCol("doc_id")
      .setMaxTokens(256).setGroupCol("source").setNumShards(2)
      .transform(corpus)
      .withColumn("len", TextFunctions.tokenCount(col("text")))
    val bad = packed
      .groupBy("source", "seq_shard", "seq_id")
      .agg(sum("len").as("tot"), count(lit(1)).as("docs"))
      .filter(col("tot") > 256 && col("docs") > 1)
      .count()
    assert(bad == 0)
    // and packing is worthwhile: sequences are fewer than docs
    val nSeq = packed.select("source", "seq_shard", "seq_id").distinct().count()
    assert(nSeq < corpus.count())
  }

  test("rejects inputs that already carry the output columns") {
    val e = intercept[IllegalArgumentException] {
      new SequencePacker().setInputCol("text").setIdCol("doc_id")
        .transform(docs.withColumn("seq_shard", lit(1)))
    }
    assert(e.getMessage.contains("seq_shard"))
  }

  test("scratch names dodge colliding input columns") {
    // a __grp/__len column in the input must not corrupt the scan
    val out = new SequencePacker().setInputCol("text").setIdCol("doc_id")
      .setMaxTokens(10)
      .transform(docs.withColumn("__grp", lit("decoy"))
        .withColumn("__len", lit(9999L)))
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 2L,
      4L -> 3L, 5L -> 4L, 6L -> 5L))
  }

  test("lengthCol overrides the computed token count") {
    val withLen = docs.withColumn("tl", lit(6L))
    val out = new SequencePacker().setInputCol("text").setIdCol("doc_id")
      .setLengthCol("tl").setMaxTokens(12)
      .transform(withLen)
      .select("doc_id", "seq_id").as[(Long, Long)].collect().toMap
    // all lens 6, budget 12 -> pairs: (0,1)(2,3)(4,5)(6)
    assert(out == Map(0L -> 0L, 1L -> 0L, 2L -> 1L, 3L -> 1L,
      4L -> 2L, 5L -> 2L, 6L -> 3L))
  }
}
