package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Nameplate probe for the StreamingNearestNeighbors probe-state
  * rework (round-18 verdict next-round #2/#3): measures the SETUP
  * wall (corpus → broadcast index) at increasing index sizes up to
  * the 2²⁰ ceiling, the cache hit (repeated transform), and the
  * rebuild-on-setCorpus. With the distributed cell assignment the
  * setup is collect-dominated (O(n) rows over the wire, no
  * driver-side argmin flops — the old loop was O(n·nLists·dim)
  * single-threaded); with the probe cache, steady-state transform
  * calls pay ZERO setup.
  * Usage: AnnSetupProbe [corpusDir]
  */
object AnnSetupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x100")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("ann-setup-probe").getOrCreate()
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"))
      val bmp = udf((id: Long) => graft.SparkEntry.testBmpBytes(id))
      val emb0 = new graft.image.ImageEmbedder().setInputCol("payload")
        .transform(docs.withColumn("payload", bmp(col("doc_id"))))
        .select(col("doc_id"), col("image_embedding"))
        .localCheckpoint()
      val nAll = emb0.count()
      val ivf = new graft.sim.IVFNearestNeighbors()
        .setInputCol("image_embedding").setIdCol("doc_id").setNLists(8)
        .fit(emb0)
      val batch = emb0.limit(64).localCheckpoint()
      Seq(nAll / 4, nAll / 2, nAll).foreach { sz =>
        val corpus = emb0.limit(sz.toInt).localCheckpoint()
        val stage = new graft.streaming.StreamingNearestNeighbors()
          .setInputCol("image_embedding").setK(4).setNProbe(8)
          .setMaxIndexEntries(1 << 20)
          .setFromModel(ivf)
          .setCorpus(corpus, "doc_id", "image_embedding")
        val t0 = System.nanoTime()
        stage.transform(batch) // setup happens here (collect+broadcast)
        val t1 = System.nanoTime()
        stage.transform(batch) // cache hit: zero setup
        val t2 = System.nanoTime()
        println(f"index=$sz setup=${(t1 - t0) / 1e9}%.2fs " +
          f"cacheHit=${(t2 - t1) / 1e9}%.3fs")
        stage.release()
      }
    } finally spark.stop()
  }
}
