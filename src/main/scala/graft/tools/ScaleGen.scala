package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale-up corpus generator for the measured scaling sweep
  * (scripts/scaling_sweep.sh -> SCALING.md): replicates the driver's
  * testdata `factor`x with key-shifting so the REPLICATED corpus keeps
  * the original's statistical shape instead of degenerating:
  *
  *  - fact tables shift their keys by `copy * (max_key + 1)` with join
  *    keys shifted CONSISTENTLY (orders.o_custkey matches the shifted
  *    customer.c_custkey, lineitem.l_orderkey the shifted orders), so
  *    join fan-outs per key are unchanged while key cardinality scales;
  *  - dimension tables (region/nation/part) stay fixed, as in TPC-H;
  *  - documents get a vocabulary-consistent per-copy relabeling (every
  *    occurrence of a word mutates identically within a copy, ~30% of
  *    the vocab per copy): within-copy Jaccard — and therefore the
  *    corpus's planted near-dup rate — is preserved exactly, while
  *    cross-copy Jaccard drops to ~0.33, far under dedup thresholds, so
  *    duplicate structure scales linearly instead of exploding;
  *  - embeddings get deterministic per-element hash-noise (±0.05) so
  *    copies are near the original manifold but not exact duplicates
  *    (exact dups would collapse ANN top-k to degenerate self-matches).
  *
  * Copy 0 is bit-identical to the source, so factor=1 round-trips.
  * Usage: ScaleGen <srcDir> <outDir> <factor>
  */
object ScaleGen {

  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: ScaleGen <srcDir> <outDir> <factor>")
    val Array(srcDir, outDir, factorS) = args.take(3)
    val factor = factorS.toInt
    require(factor >= 1, s"factor must be >= 1, got $factor")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tbl(name: String): DataFrame =
      spark.read.parquet(s"$srcDir/$name.parquet")
    def write(df: DataFrame, name: String): Unit =
      df.write.mode("overwrite").parquet(s"$outDir/$name.parquet")
    def stride(df: DataFrame, keyCol: String): Long =
      df.agg(max(col(keyCol))).head().getLong(0) + 1L
    // one row per (source row, copy); the copy column drives the shifts
    def rep(df: DataFrame): DataFrame = df.withColumn("__copy",
      explode(sequence(lit(0L), lit(factor - 1L))))
    def shifted(key: String, s: Long) = col(key) + col("__copy") * s

    // dimensions: fixed size at every scale, as in TPC-H
    Seq("region", "nation", "part").foreach(n => write(tbl(n), n))

    val custStride = stride(tbl("customer"), "c_custkey")
    val ordStride = stride(tbl("orders"), "o_orderkey")
    val suppStride = stride(tbl("supplier"), "s_suppkey")

    write(rep(tbl("customer"))
      .withColumn("c_custkey", shifted("c_custkey", custStride))
      .drop("__copy"), "customer")
    write(rep(tbl("supplier"))
      .withColumn("s_suppkey", shifted("s_suppkey", suppStride))
      .drop("__copy"), "supplier")
    write(rep(tbl("orders"))
      .withColumn("o_orderkey", shifted("o_orderkey", ordStride))
      .withColumn("o_custkey", shifted("o_custkey", custStride))
      .drop("__copy"), "orders")
    write(rep(tbl("lineitem"))
      .withColumn("l_orderkey", shifted("l_orderkey", ordStride))
      .withColumn("l_suppkey", shifted("l_suppkey", suppStride))
      .drop("__copy"), "lineitem")

    val events = tbl("events")
    val evStride = stride(events, "event_id")
    val userStride = stride(events, "user_id")
    write(rep(events)
      .withColumn("event_id", shifted("event_id", evStride))
      .withColumn("user_id", shifted("user_id", userStride))
      .drop("__copy"), "events")

    val docs = tbl("documents")
    val docStride = stride(docs, "doc_id")
    val relabeled = expr(
      """array_join(transform(split(text, ' '), w ->
        |  CASE WHEN __copy > 0 AND pmod(xxhash64(w, __copy), 10) < 3
        |       THEN concat(w, '~', CAST(__copy AS STRING)) ELSE w END), ' ')
        |""".stripMargin)
    write(rep(docs)
      .withColumn("doc_id", shifted("doc_id", docStride))
      .withColumn("text", relabeled)
      .withColumn("n_chars", length(col("text")).cast("long"))
      .drop("__copy"), "documents")

    val emb = tbl("embeddings")
    val vecStride = stride(emb, "vec_id")
    val perturbed = expr(
      """transform(embedding, (x, i) ->
        |  CASE WHEN __copy > 0 THEN CAST(x +
        |    (pmod(xxhash64(vec_id, i, __copy), 1001) / 500.0 - 1.0) * 0.05
        |    AS FLOAT) ELSE x END)
        |""".stripMargin)
    write(rep(emb)
      .withColumn("vec_id", shifted("vec_id", vecStride))
      .withColumn("embedding", perturbed)
      .drop("__copy"), "embeddings")

    println(s"""{"scale_gen":"done","src":"$srcDir","out":"$outDir","factor":$factor}""")
    spark.stop()
    sys.exit(0)
  }
}
