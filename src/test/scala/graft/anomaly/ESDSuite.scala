package graft.anomaly

import graft.TestBase
import org.apache.spark.sql.functions._

class ESDSuite extends TestBase {
  import spark.implicits._

  test("StudentT quantile matches published t-table values") {
    // R qt() goldens
    assert(math.abs(StudentT.quantile(0.975, 10) - 2.2281388) < 1e-6)
    assert(math.abs(StudentT.quantile(0.95, 5) - 2.0150484) < 1e-6)
    assert(math.abs(StudentT.quantile(0.995, 30) - 2.7499957) < 1e-6)
    assert(math.abs(StudentT.quantile(0.5, 7)) < 1e-6)
    assert(math.abs(StudentT.quantile(0.025, 10) + 2.2281388) < 1e-6)
  }

  test("esdLambda matches Rosner's published critical values") {
    // Rosner (1983) Table: n=54, alpha=0.05 -> lambda_1=3.158, lambda_2=3.151
    val d = new ESDAnomalyDetector()
    assert(math.abs(d.esdLambda(54, 1, 0.05) - 3.158) < 2e-3)
    assert(math.abs(d.esdLambda(54, 2, 0.05) - 3.151) < 2e-3)
    assert(d.esdLambda(54, 3, 0.05) < d.esdLambda(54, 2, 0.05) + 1e-9)
  }

  test("detects planted outliers per series, leaves clean series alone") {
    // series A: tight gaussian-ish base + two wild points; series B: clean
    val a = (0 until 50).map(i => ("a", i.toLong, 100.0 + (i % 7) - 3)) ++
      Seq(("a", 100L, 500.0), ("a", 101L, -300.0))
    val b = (0 until 50).map(i => ("b", (200 + i).toLong, 10.0 + (i % 5)))
    val df = (a ++ b).toDF("series", "id", "v")
    val out = new ESDAnomalyDetector().setInputCol("v").setIdCol("id")
      .setGroupCols(Array("series")).setMaxAnomalies(4).setAlpha(0.05)
      .transform(df)
    val anomalies = out.filter(col("is_anomaly"))
      .select("series", "id").as[(String, Long)].collect().toSet
    assert(anomalies == Set(("a", 100L), ("a", 101L)))
    // iteration order: biggest deviation removed first
    val iters = out.filter(col("is_anomaly")).select("id", "iter")
      .as[(Long, Int)].collect().toMap
    assert(iters(100L) == 1 && iters(101L) == 2) // 500 deviates more than -300
  }

  test("fixed criticalValues mode and global (ungrouped) series") {
    val df = ((0 until 30).map(i => (i.toLong, 50.0 + (i % 3))) :+ (99L, 400.0))
      .toDF("id", "v")
    val out = new ESDAnomalyDetector().setInputCol("v").setIdCol("id")
      .setMaxAnomalies(2).setCriticalValues(Array(3.0, 3.0))
      .transform(df)
    val anom = out.filter(col("is_anomaly")).select("id").as[Long].collect()
    assert(anom.toSeq == Seq(99L))
  }

  test("deterministic across partitionings") {
    val data = (0 until 200).map(i =>
      (("s" + (i % 3)), i.toLong, (i * 37 % 97).toDouble)) ++
      Seq(("s0", 900L, 5000.0), ("s1", 901L, -4000.0))
    def run(parts: Int): Set[(String, Long)] = {
      val df = spark.createDataFrame(data).toDF("series", "id", "v")
        .repartition(parts)
      new ESDAnomalyDetector().setInputCol("v").setIdCol("id")
        .setGroupCols(Array("series")).setMaxAnomalies(3)
        .transform(df)
        .filter(col("is_anomaly")).select("series", "id")
        .as[(String, Long)].collect().toSet
    }
    assert(run(1) == run(13))
  }

  test("rows with null value or null id are ignored, not fatal") {
    val df = Seq(
      (java.lang.Long.valueOf(1L), java.lang.Double.valueOf(50.0)),
      (java.lang.Long.valueOf(2L), java.lang.Double.valueOf(51.0)),
      (java.lang.Long.valueOf(3L), null.asInstanceOf[java.lang.Double]),
      (null.asInstanceOf[java.lang.Long], java.lang.Double.valueOf(52.0)),
      (java.lang.Long.valueOf(4L), java.lang.Double.valueOf(53.0)),
      (java.lang.Long.valueOf(99L), java.lang.Double.valueOf(400.0))
    ).toDF("id", "v")
    val out = new ESDAnomalyDetector().setInputCol("v").setIdCol("id")
      .setMaxAnomalies(1).setCriticalValues(Array(1.2)).transform(df)
    assert(out.count() == 6) // every input row survives the left join
    val anom = out.filter(col("is_anomaly")).select("id").as[Long].collect()
    assert(anom.toSeq == Seq(99L))
  }

  test("rosnerVerdicts is invariant to point arrival order") {
    // the executor-side loop must produce identical verdicts no matter how
    // the shuffle delivers a series' rows — including duplicate ids and
    // heavy value ties
    val rnd = new scala.util.Random(6174)
    for (trial <- 0 until 100) {
      val n = 2 + rnd.nextInt(30)
      val pts = Vector.fill(n)(
        ("", rnd.nextInt(10).toLong, (rnd.nextInt(7) * 10).toDouble))
      val k = 1 + rnd.nextInt(4)
      val cvs = Some(Array.fill(k)(0.5 + rnd.nextDouble()))
      def run(order: Vector[(String, Long, Double)]): Seq[(Long, Int)] =
        ESDAnomalyDetector.rosnerVerdicts(order.iterator, k, 0.05, cvs)
          .toSeq.sorted
      val base = run(pts)
      assert(run(rnd.shuffle(pts)) == base, s"trial $trial order-dependent")
      assert(run(pts.reverse) == base, s"trial $trial reverse-dependent")
    }
  }

  test("many-series: verdicts stay correct with thousands of series") {
    // 2000 series × 20 points, every third series carries one planted
    // outlier — the loop runs per-series inside flatMapGroups, so series
    // count stresses executor parallelism, not driver memory
    val data = (0 until 2000).flatMap { s =>
      val base = (0 until 20).map(i =>
        (s"srs$s", (s * 100 + i).toLong, 10.0 + ((s * 31 + i * 7) % 11)))
      if (s % 3 == 0) base :+ (s"srs$s", (s * 100 + 99).toLong, 9999.0)
      else base
    }
    val out = new ESDAnomalyDetector().setInputCol("v").setIdCol("id")
      .setGroupCols(Array("series")).setMaxAnomalies(2)
      .setCriticalValues(Array(3.0, 3.0))
      .transform(data.toDF("series", "id", "v"))
      .filter(col("is_anomaly")).select("series", "id")
      .as[(String, Long)].collect()
    val expected = (0 until 2000).filter(_ % 3 == 0)
      .map(s => (s"srs$s", (s * 100 + 99).toLong)).toSet
    assert(out.toSet == expected)
    assert(out.length == expected.size)
  }
}
