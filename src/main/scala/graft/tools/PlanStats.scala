package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Structural plan sweep (optimization guide §7.2): for every SparkEntry
  * query, build the DataFrame and print one line of plan-shape stats —
  * operator count, Exchange count, parquet-scan count, formatted-plan
  * size — WITHOUT running the final action (construction itself may run
  * eager work: fits, localCheckpoints, streaming gates; its wall is
  * reported separately as buildSec). This is how the round-19 sweep
  * found the 1,873-operator IncrementalMinHash plan; op counts far
  * above the stage count signal replanned subtrees (plan-time driver
  * cost) and multiply-referenced frames.
  * Usage: PlanStats <sfDir> [query ...]   (default: all queries)
  */
object PlanStats {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: PlanStats <sfDir> [query...]")
    val dir = args.head
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.core.SessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true"))
      .getOrCreate() // SessionDefaults: match Bench
    spark.sparkContext.setLogLevel("ERROR")
    val names =
      if (args.tail.nonEmpty) args.tail.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { q =>
      try {
        val t0 = System.nanoTime()
        val df = graft.SparkEntry.queries(q)(spark, dir)
        val build = (System.nanoTime() - t0) / 1e9
        val plan = df.queryExecution.explainString(
          ExplainMode.fromString("formatted"))
        // count in the TREE section only (the details section repeats
        // every operator name and double-counted r19's Exchange figures:
        // 225 tree Exchanges printed as "450 exchanges" elsewhere), and
        // never count a ReusedExchange as a new shuffle
        val tree = plan.linesIterator.takeWhile(_.nonEmpty).toSeq
        val ops = "\\(\\d+\\)".r.findAllIn(tree.mkString("\n")).size
        val ex = tree.count(l =>
          l.contains("Exchange") && !l.contains("ReusedExchange"))
        val scans = tree.count(_.contains("Scan parquet"))
        val smj = tree.count(_.contains("SortMergeJoin"))
        val bnl = tree.count(_.contains("BroadcastNestedLoopJoin")) +
          tree.count(_.contains("CartesianProduct"))
        println(f"PLANSTAT $q%-36s ops=$ops%5d ex=$ex%3d scans=$scans%3d " +
          f"smj=$smj%2d bnl=$bnl%2d build=$build%6.2f planChars=${plan.length}%8d")
      } catch {
        case e: Throwable =>
          println(s"PLANSTAT $q ERROR ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").take(120)}")
      }
    }
    spark.stop()
    try graft.MockServices.stopAll() catch { case _: Throwable => () }
    sys.exit(0)
  }
}
