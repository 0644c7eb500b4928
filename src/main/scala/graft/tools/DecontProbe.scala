package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: stage-by-stage attribution of the decontaminate gate's
  * wall (flag = bench grams -> broadcast -> corpus gram semi-join ->
  * distinct ids -> left join back).
  *
  * Usage: graft.tools.DecontProbe <sfDir>
  */
object DecontProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    docs.count() // warm

    def timed(tag: String)(body: => Unit): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$tag%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    val corpus = docs.filter(col("source") =!= "src0")
    val bench = docs.filter(col("source") === "src0")
    timed("tokens only") {
      corpus.select(explode(split(trim(col("text")), "\\s+"))).write
        .mode("overwrite").format("noop").save()
    }
    timed("grams explode") {
      corpus.withColumn("__t", split(trim(col("text")), "\\s+"))
        .select(explode(graft.text.PipelineFunctions.wordNGrams(col("__t"), 4)))
        .write.mode("overwrite").format("noop").save()
    }
    timed("grams hashed") {
      corpus.withColumn("__t", split(trim(col("text")), "\\s+"))
        .select(explode(
          graft.text.PipelineFunctions.wordNGrams(col("__t"), 4)).as("__g"))
        .select(xxhash64(col("__g")))
        .write.mode("overwrite").format("noop").save()
    }
    timed("bench grams distinct") {
      bench.withColumn("__t", split(trim(col("text")), "\\s+"))
        .select(explode(
          graft.text.PipelineFunctions.wordNGrams(col("__t"), 4)).as("__g"))
        .select(xxhash64(col("__g")).as("__gh")).distinct()
        .write.mode("overwrite").format("noop").save()
    }
    timed("semi-join no distinct") {
      val b0 = bench.withColumn("__t", split(trim(col("text")), "\\s+"))
        .select(explode(
          graft.text.PipelineFunctions.wordNGrams(col("__t"), 4)).as("__g"))
        .select(xxhash64(col("__g")).as("__gh")).distinct()
      corpus.withColumn("__t", split(trim(col("text")), "\\s+"))
        .select(col("doc_id"), explode(
          graft.text.PipelineFunctions.wordNGrams(col("__t"), 4)).as("__g"))
        .select(col("doc_id"), xxhash64(col("__g")).as("__gh"))
        .join(broadcast(b0), Seq("__gh"), "left_semi")
        .write.mode("overwrite").format("noop").save()
    }
    timed("contaminatedIds") {
      graft.text.Decontamination.contaminatedIds(corpus, bench, "text", "doc_id")
        .write.mode("overwrite").format("noop").save()
    }
    println("=== contaminatedIds optimized plan ===")
    println(graft.text.Decontamination
      .contaminatedIds(corpus, bench, "text", "doc_id")
      .queryExecution.optimizedPlan.toString.take(4000))
    timed("flag (full gate)") {
      graft.text.Decontamination.flag(corpus, bench, "text", "doc_id")
        .select(col("doc_id"), col("is_contaminated"))
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
