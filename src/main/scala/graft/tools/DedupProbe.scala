package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: posting-list size distribution of the n-gram dedup prefix
  * index on a given corpus — run when the scaling sweep flags the
  * candidate-pair stage (pairs per key grow with the square of the
  * posting-list cap, so one hot shingle hash dominates the join).
  *
  * Usage: graft.tools.DedupProbe <sfDir> [shingleSize] [indexShingles]
  */
object DedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val k = if (args.length > 1) args(1).toInt else 3
    val p = if (args.length > 2) args(2).toInt else 8
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = spark.read.parquet(s"$dir/documents.parquet")
    val inv = df.select(col("doc_id").cast("long").as("__id"),
      explode(slice(graft.dedup.DedupFunctions.hashedShingles(col("text"), k),
        1, p)).as("__key"))
    val sizes = inv.groupBy("__key").agg(count(lit(1)).as("n")).cache()
    val total = sizes.agg(sum("n"), count(lit(1))).head()
    println(s"index entries=${total.getLong(0)} distinct keys=${total.getLong(1)}")
    println("top-20 posting lists:")
    sizes.orderBy(desc("n")).limit(20).collect()
      .foreach(r => println(s"  key=${r.getLong(0)} n=${r.getLong(1)}"))
    val hist = sizes.select(
      sum(when(col("n") >= 1000, col("n") * (col("n") - 1) / 2)
        .otherwise(lit(0))).as("pairs_from_1000plus"),
      sum(when(col("n").between(100, 999), col("n") * (col("n") - 1) / 2)
        .otherwise(lit(0))).as("pairs_100_999"),
      sum(when(col("n") < 100, col("n") * (col("n") - 1) / 2)
        .otherwise(lit(0))).as("pairs_lt100"),
      sum(when(col("n") >= 1000, lit(1)).otherwise(lit(0))).as("keys_1000plus"),
      sum(when(col("n").between(100, 999), lit(1)).otherwise(lit(0))).as("keys_100_999"))
      .head()
    println(s"uncapped pair mass: >=1000: ${hist.get(0)} (keys=${hist.get(3)}), " +
      s"100-999: ${hist.get(1)} (keys=${hist.get(4)}), <100: ${hist.get(2)}")
    spark.stop()
  }
}
