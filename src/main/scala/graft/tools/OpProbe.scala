package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: time an operator in its SCALE shape (defaults, no gate
  * plumbing) on a given corpus, to attribute scaling-sweep alphas to the
  * operator vs the fixture-pinned gate around it.
  *
  * Usage: graft.tools.OpProbe <sfDir> <op>  where op is one of
  *   lsh  — LSHNearestNeighbors at DEFAULT 64-plane/4-band params
  *          (the knn_lsh gate pins 2-bit bands for tiny fixtures)
  *   vw   — VowpalHashFeaturizer alone (the gate's long-form explode
  *          UDF is oracle plumbing, not the operator)
  *   knngraph — KNNGraph in its SCALE shape: ivf mode over the FULL
  *          embeddings table, nLists = √(n·nProbe) per the FAISS rule
  *          the scaladoc prescribes (the knn_graph gate pins a 100-node
  *          brute subgraph for its all-pairs oracle — constant-size by
  *          design, so its sweep row says nothing about scale)
  */
object OpProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val op = args(1)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup read
    spark.read.parquet(s"$dir/embeddings.parquet").count()
    spark.read.parquet(s"$dir/events.parquet").count()
    val t0 = System.nanoTime()
    val n = op match {
      case "lsh" =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        new graft.sim.LSHNearestNeighbors().setInputCol("embedding")
          .setIdCol("vec_id").setK(5)
          .setQueries(emb.filter(col("vec_id") < 10), "vec_id", "embedding")
          .transform(emb).count()
      case "vw" =>
        // count() would prune the features column away — consume each
        // vector with an O(nnz) accessor (vector_to_array would densify
        // the 2^18-dim sparse vector into 2 MB/row and measure the
        // materialization, not the featurizer)
        val nnz = udf((v: org.apache.spark.ml.linalg.Vector) => v.numActives)
        new graft.featurize.VowpalHashFeaturizer()
          .setInputCols(Seq("value", "event_type")).setNumBits(18)
          .transform(spark.read.parquet(s"$dir/events.parquet"))
          .select(nnz(col("features")).as("a"))
          .agg(sum(col("a"))).head().getLong(0)
      case "knngraph" =>
        val emb = spark.read.parquet(s"$dir/embeddings.parquet")
        val n = emb.count()
        val nProbe = 8
        val lists = math.max(8, math.sqrt(n.toDouble * nProbe).toInt)
        new graft.sim.KNNGraph().setInputCol("embedding")
          .setIdCol("vec_id").setK(10).setNLists(lists).setNProbe(nProbe)
          .transform(emb)
          .select(explode(col("neighbors.id")).as("id"))
          .agg(count(lit(1))).head().getLong(0)
      case other => sys.error(s"unknown op $other")
    }
    val wall = (System.nanoTime() - t0) / 1e9
    println(f"""{"op":"$op","dir":"$dir","wall":$wall%.3f,"rows":$n}""")
    spark.stop()
  }
}
