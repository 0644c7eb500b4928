package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class ScoreSelectorSuite extends TestBase {
  import spark.implicits._

  lazy val docs = sfTable("documents").select("doc_id", "n_chars")

  test("exact mode keeps exactly ceil(f*n), highest scores, ties by id") {
    val out = new ScoreSelector().setScoreCol("n_chars").setIdCol("doc_id")
      .setFraction(0.25).setMode("exact").transform(docs)
    val n = docs.count()
    assert(out.count() == math.ceil(0.25 * n).toLong)
    // every kept row dominates every dropped row under (score, -id)
    val keptMin = out.agg(min("n_chars")).head().getLong(0)
    val dropped = docs.join(out.select("doc_id"), Seq("doc_id"), "left_anti")
    val dropMax = dropped.agg(max("n_chars")).head().getLong(0)
    assert(dropMax <= keptMin)
    // boundary ties resolve by ascending id
    if (dropMax == keptMin) {
      val keptBoundaryMax = out.filter(col("n_chars") === keptMin)
        .agg(max("doc_id")).head().getLong(0)
      val droppedBoundaryMin = dropped.filter(col("n_chars") === dropMax)
        .agg(min("doc_id")).head().getLong(0)
      assert(keptBoundaryMax < droppedBoundaryMin)
    }
  }

  test("approx mode keeps ~f with a narrow no-sort plan") {
    val out = new ScoreSelector().setScoreCol("n_chars")
      .setFraction(0.25).setMode("approx").setApproxError(0.01)
      .transform(docs)
    val frac = out.count().toDouble / docs.count()
    assert(math.abs(frac - 0.25) < 0.05, s"kept fraction $frac")
    // no sort/exchange in the filter plan (the quantile job ran already)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort "), "approx mode must not sort")
  }

  test("per-domain exact selection keeps ceil(f*n) within every group") {
    val withDom = sfTable("documents").select("doc_id", "n_chars", "source")
    val out = new ScoreSelector().setScoreCol("n_chars").setIdCol("doc_id")
      .setFraction(0.25).setMode("exact").setPartitionCol("source")
      .transform(withDom)
    val perDomain = withDom.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    val kept = out.groupBy("source").count()
      .as[(String, Long)].collect().toMap
    perDomain.foreach { case (d, n) =>
      assert(kept.getOrElse(d, 0L) == math.ceil(0.25 * n).toLong,
        s"domain $d: kept ${kept.getOrElse(d, 0L)} of $n")
    }
  }

  test("per-domain approx thresholds are computed per group") {
    val withDom = sfTable("documents").select("doc_id", "n_chars", "source")
    val out = new ScoreSelector().setScoreCol("n_chars")
      .setFraction(0.5).setMode("approx").setApproxError(0.01)
      .setPartitionCol("source").transform(withDom)
    val kept = out.groupBy("source").count().as[(String, Long)].collect()
    // every domain keeps a nonzero share near half its docs
    assert(kept.nonEmpty)
    kept.foreach { case (d, n) => assert(n > 0, s"domain $d kept nothing") }
  }

  test("fraction 0.0 keeps nothing in every mode") {
    for (mode <- Seq("exact", "approx")) {
      val n = new ScoreSelector().setScoreCol("n_chars").setIdCol("doc_id")
        .setFraction(0.0).setMode(mode).transform(docs).count()
      assert(n == 0, s"mode $mode kept $n rows at fraction 0")
    }
    // and per-group approx: the short-circuit fires before grouping
    val n = new ScoreSelector().setScoreCol("n_chars").setIdCol("doc_id")
      .setFraction(0.0).setMode("approx").setPartitionCol("lang")
      .transform(docs.withColumn("lang", lit("en"))).count()
    assert(n == 0)
  }

  test("approx and exact agree away from the threshold") {
    val exact = new ScoreSelector().setScoreCol("n_chars").setIdCol("doc_id")
      .setFraction(0.25).setMode("exact").transform(docs)
      .select("doc_id").as[Long].collect().toSet
    val approx = new ScoreSelector().setScoreCol("n_chars")
      .setFraction(0.25).setMode("approx").setApproxError(0.001)
      .transform(docs).select("doc_id").as[Long].collect().toSet
    // symmetric difference concentrated at the boundary score
    val diff = (exact diff approx) union (approx diff exact)
    assert(diff.size <= (0.02 * docs.count()).toInt + 25,
      s"approx/exact diverge on ${diff.size} docs")
  }
}
