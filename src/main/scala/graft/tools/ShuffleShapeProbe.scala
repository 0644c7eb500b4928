package graft.tools

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off comparison backing the round-12 CorpusShuffler retrofit: time
  * the OLD full-payload global sort (every row rides the range exchange
  * and the zipWithIndex scan) against the committed narrow-sort shape
  * ((hash, id) only + payload hash join) on the same corpus, printing
  * wall and shuffle volume for each.
  *
  * Usage: graft.tools.ShuffleShapeProbe <dir>
  */
object ShuffleShapeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val acc = new java.util.concurrent.atomic.LongAdder
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            ev: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = ev.stageInfo.taskMetrics
          if (m != null) acc.add(m.shuffleWriteMetrics.bytesWritten)
        }
      })
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text"))

    def timed(tag: String)(body: => Long): Unit = {
      acc.reset()
      val t0 = System.nanoTime()
      val n = body
      val w = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener drain
      println(f"$tag%-12s wall=$w%7.2f s rows=$n shuffleWrite=${acc.sum / 1e6}%.1f MB")
    }

    timed("old-full") {
      val sorted = df.orderBy(
        md5(concat(col("doc_id").cast(StringType), lit(":42"))), col("doc_id"))
      val schema = StructType(sorted.schema :+
        StructField("shuffle_pos", LongType, nullable = false))
      spark.createDataFrame(
        sorted.rdd.zipWithIndex().map { case (r, i) =>
          Row.fromSeq(r.toSeq :+ i)
        }, schema).write.mode("overwrite").format("noop").save()
      0L
    }
    timed("new-narrow") {
      new graft.text.CorpusShuffler().setIdCol("doc_id").transform(df)
        .write.mode("overwrite").format("noop").save()
      0L
    }
    spark.stop()
  }
}
