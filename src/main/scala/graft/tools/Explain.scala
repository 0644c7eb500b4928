package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan inspector: print the formatted physical plan (and optionally time
  * an action) for named SparkEntry queries against a data dir.
  * Usage: Explain <sfDir> <query> [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: Explain <sfDir> <query> [query...]")
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate() // SessionDefaults: match Bench
    spark.sparkContext.setLogLevel("WARN")
    args.tail.foreach { q =>
      val df = graft.SparkEntry.queries(q)(spark, dir)
      println(s"===== $q =====")
      df.explain("formatted")
      val t0 = System.nanoTime()
      val n = df.count()
      println(f"-- $q: $n rows in ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
    MockRefs.stopAll()
    sys.exit(0)
  }

  private object MockRefs {
    def stopAll(): Unit =
      try graft.MockServices.stopAll() catch { case _: Throwable => () }
  }
}
