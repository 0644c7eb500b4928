package graft.tools

import org.apache.spark.sql.functions._

/** Cosine-spectrum probe for the trained_embed_chain operating point:
  * fits the gate's exact TrainedEmbedder configuration on a real
  * documents table and prints quantiles of the all-pairs cosine
  * distribution, so the SemDeDup threshold is picked from measurement
  * instead of guessed (learned topic vectors over a small-vocabulary
  * corpus sit far more similar than hashed ones — the gate's first
  * draft at 0.95 deduped 498 of 500 docs).
  * Usage: EmbedChainProbe [sfDir] */
object EmbedChainProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[8]").appName("embed-chain-probe")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false).getOrCreate()
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val m = new graft.text.TrainedEmbedder().setInputCol("text")
      .setDim(32).setMinCount(2).setMaxIter(1).setTrainSample(4096)
      .setSubwordBits(16).fit(docs)
    val e = m.transform(docs).select("doc_id", "embedding")
      .collect().map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    val cos = (for {
      i <- e.indices
      j <- (i + 1) until e.length
    } yield {
      val (a, b) = (e(i)._2, e(j)._2)
      var s = 0.0; var k = 0
      while (k < a.length) { s += a(k) * b(k).toDouble; k += 1 }
      s
    }).sorted
    def q(p: Double) = cos(((cos.length - 1) * p).toInt)
    println(f"n=${cos.length} min=${cos.head}%.4f p50=${q(0.5)}%.4f " +
      f"p90=${q(0.9)}%.4f p99=${q(0.99)}%.4f p999=${q(0.999)}%.4f " +
      f"p9999=${q(0.9999)}%.4f max=${cos.last}%.4f")
    spark.stop()
  }
}
