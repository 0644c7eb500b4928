package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Nameplate probe for the StreamingMinHashDeduplicator two-tier
  * (foreachBatch) mode: build a signature index PAST the DSL broadcast
  * ceiling (2¹⁹ entries ≈ 512 MB of full signatures), show the DSL
  * path refuses it, then push a micro-batch through
  * `transformMicroBatch` and report the setup (band frame + Bloom) and
  * per-batch walls. The index is the corpus documents UNION a
  * token-perturbed copy (distinct shingles → distinct signatures), so
  * entry count ≈ 2 × corpus rows.
  * Usage: TwoTierMinHashProbe [corpusDir [batchRows]]
  */
object TwoTierMinHashProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x100")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("two-tier-minhash-probe").getOrCreate()
    try {
      val docs = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), col("text"))
      val corpus = docs
        .unionByName(docs.select((col("doc_id") + 10000000L).as("doc_id"),
          concat(col("text"), lit(" perturbed variant tail")).as("text")))
      val t0 = System.nanoTime()
      val idx = graft.streaming.StreamingMinHashDeduplicator
        .signatureIndex(corpus, "doc_id", "text", 3, 128)
        .localCheckpoint() // one signature pass; the index a pipeline persists
      val entries = idx.count()
      val tIdx = System.nanoTime()
      println(f"index entries=$entries (ceiling ${1 << 19}) " +
        f"build=${(tIdx - t0) / 1e9}%.1fs")
      val stage = new graft.streaming.StreamingMinHashDeduplicator()
        .setInputCol("text").setThreshold(0.85).setCorpusIndex(idx)
      val refused =
        try { stage.transform(docs.limit(10)); "NOT refused (BUG)" }
        catch { case e: IllegalArgumentException
            if e.getMessage.contains("maxIndexEntries") => "refused (ok)" }
      println(s"DSL broadcast path at $entries entries: $refused")
      // batch fixture: half corpus dups (flagged -> tier-2 verify ->
      // drop), half GENUINELY novel token streams (tier-1 Bloom-clean
      // -> skip the join entirely — the steady-state majority of a
      // real ingest)
      val novelUdf = udf((id: Long) =>
        (1 to 30).map(j => s"n${id}w$j").mkString(" "))
      val batch = docs.filter(col("doc_id") % 4 === 0).limit(batchRows / 2)
        .unionByName(docs.filter(col("doc_id") % 4 === 1)
          .limit(batchRows / 2)
          .select(col("doc_id"), novelUdf(col("doc_id")).as("text")))
      val t1 = System.nanoTime()
      val out1 = stage.transformMicroBatch(batch).count()
      val t2 = System.nanoTime()
      val out2 = stage.transformMicroBatch(batch).count()
      val t3 = System.nanoTime()
      println(f"microBatch(${batchRows} rows): first=" +
        f"${(t2 - t1) / 1e9}%.1fs (incl. band-frame persist + Bloom " +
        f"build), steady=${(t3 - t2) / 1e9}%.1fs, survivors=$out1/$out2")
    } finally spark.stop()
  }
}
