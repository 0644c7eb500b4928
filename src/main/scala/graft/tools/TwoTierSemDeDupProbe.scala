package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Nameplate probe for the StreamingSemDeDup two-tier (foreachBatch)
  * mode: build an embedding index PAST the DSL broadcast ceiling
  * (2¹⁸ entries — the family's FATTEST per-entry index, ~dim·8
  * B/entry), show the DSL path refuses it, then push a micro-batch
  * through `transformMicroBatch` and report the setup (narrow
  * (cell, vector) index persist + occupied-cell BitSet) and
  * per-batch walls. The
  * index is the embeddings table UNION perturbed copies (distinct
  * vectors → distinct index entries) under an auto-k quantizer, so
  * the per-cell buffers stay at the ~256-member operating point.
  * Usage: TwoTierSemDeDupProbe [corpusDir [batchRows]]
  */
object TwoTierSemDeDupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("target/scale/x100")
    val batchRows = args.lift(1).map(_.toInt).getOrElse(50000)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", false)
      .appName("two-tier-semdedup-probe").getOrCreate()
    try {
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        .select(col("vec_id"), col("embedding"))
      // perturbed copies: shift one coordinate per copy so vectors stay
      // distinct and spread across cells
      def copyAt(k: Int) = emb.select(
        (col("vec_id") + lit(k * 10000000L)).as("vec_id"),
        org.apache.spark.sql.functions.transform(
          col("embedding").cast("array<double>"),
          (v, i) => v + when(i === (k % 16), lit(0.37 * k)).otherwise(0.0))
          .as("embedding"))
      val corpus = (1 to 3).map(copyAt).foldLeft(emb.toDF())(_ unionByName _)
        .localCheckpoint()
      val n = corpus.count()
      val m = new graft.dedup.IncrementalSemDeDup().setInputCol("embedding")
        .setIdCol("vec_id").setThreshold(0.465)
        .setTargetClusterSize(256).setCorpusSizeHint(n)
        .fit(corpus)
      val t0 = System.nanoTime()
      val idx = m.indexCorpus(corpus).localCheckpoint()
      val entries = idx.count()
      val tIdx = System.nanoTime()
      println(f"index entries=$entries (ceiling ${1 << 18}) " +
        f"build=${(tIdx - t0) / 1e9}%.1fs")
      val stage = new graft.streaming.StreamingSemDeDup()
        .setInputCol("embedding").setFromModel(m).setCorpusIndex(idx)
      val refused =
        try { stage.transform(emb.limit(10)); "NOT refused (BUG)" }
        catch { case e: IllegalArgumentException
            if e.getMessage.contains("maxIndexEntries") => "refused (ok)" }
      println(s"DSL broadcast path at $entries entries: $refused")
      // batch fixture: half corpus dups (occupied cell -> tier-2 verify
      // -> drop), half genuinely novel directions (tier 1 passes them
      // only if their cell happens to be occupied — at the ~256-member
      // operating point most novel cells still are, so this measures
      // the WORST-case verify load, not the empty-cell fast path)
      val dim = emb.select(size(col("embedding"))).head().getInt(0)
      val novelV = udf((id: Long) =>
        Array.tabulate(dim)(j => math.sin(id * 31.7 + j * 7.3) * 5.0))
      val batch = emb.filter(col("vec_id") % 4 === 0).limit(batchRows / 2)
        .unionByName(emb.filter(col("vec_id") % 4 === 1)
          .limit(batchRows / 2)
          .select(col("vec_id"), novelV(col("vec_id")).as("embedding")))
      val t1 = System.nanoTime()
      val out1 = stage.transformMicroBatch(batch).count()
      val t2 = System.nanoTime()
      val out2 = stage.transformMicroBatch(batch).count()
      val t3 = System.nanoTime()
      println(f"microBatch(${batchRows} rows): first=" +
        f"${(t2 - t1) / 1e9}%.1fs (incl. index persist + BitSet " +
        f"build), steady=${(t3 - t2) / 1e9}%.1fs, survivors=$out1/$out2")
    } finally spark.stop()
  }
}
