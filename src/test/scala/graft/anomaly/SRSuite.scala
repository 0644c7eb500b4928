package graft.anomaly

import graft.TestBase
import org.apache.spark.sql.functions._

class SRSuite extends TestBase {
  import spark.implicits._

  test("FFT: impulse has flat spectrum, roundtrip restores input") {
    val re = Array(1.0, 0, 0, 0, 0, 0, 0, 0)
    val im = new Array[Double](8)
    FFT.transform(re, im, inverse = false)
    re.foreach(v => assert(math.abs(v - 1.0) < 1e-12))
    im.foreach(v => assert(math.abs(v) < 1e-12))
    // roundtrip
    val r2 = Array(3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0)
    val i2 = new Array[Double](8)
    val orig = r2.clone()
    FFT.transform(r2, i2, inverse = false)
    FFT.transform(r2, i2, inverse = true)
    orig.indices.foreach(k => assert(math.abs(r2(k) - orig(k)) < 1e-9))
  }

  test("FFT: pure cosine concentrates at its frequency bin") {
    val n = 64
    val re = Array.tabulate(n)(t => math.cos(2 * math.Pi * 5 * t / n))
    val im = new Array[Double](n)
    FFT.transform(re, im, inverse = false)
    val amp = Array.tabulate(n)(i => math.hypot(re(i), im(i)))
    assert(amp(5) > 30 && amp(n - 5) > 30) // bin 5 and its conjugate
    amp.indices.filterNot(i => i == 5 || i == n - 5)
      .foreach(i => assert(amp(i) < 1e-6))
  }

  test("saliency spikes at a planted step anomaly") {
    val d = new SRAnomalyDetector().setInputCol("v")
    val xs = Array.tabulate(128)(t =>
      10.0 + math.sin(2 * math.Pi * t / 16)) // smooth periodic
    xs(100) = 25.0 // spike
    val sal = d.saliency(xs)
    val spikeRank = sal.zipWithIndex.sortBy(-_._1).indexWhere(_._2 == 100)
    assert(spikeRank <= 2, s"spike saliency rank $spikeRank")
  }

  test("sr_anomalies gate construction keeps margin from the threshold") {
    // mirrors the driver gate: flat base, one +1000 spike at position 29;
    // median-centering silences the base exactly, so the spike's score
    // must tower over the threshold and every base score must sit far
    // below it — the gate can't be one fixture tweak away from flipping
    val d = new SRAnomalyDetector().setInputCol("v")
      .setOrderCol("t").setGroupCols(Array("series")).setThreshold(3.0)
    for (n <- Seq(40, 80, 100)) {
      val rows = (1 to n).map(t =>
        ("s", t.toLong, if (t == 29) 1100.0 else 100.0))
      val out = d.transform(rows.toDF("series", "t", "v"))
        .select("t", "sr_score").collect()
        .map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(out(29L) > 30.0, s"n=$n spike score ${out(29L)} too close to 3")
      val baseMax = out.removed(29L).values.max
      assert(baseMax < 1.0, s"n=$n base score $baseMax too close to 3")
    }
  }

  test("detects the planted spike per series end-to-end") {
    val rows =
      (0 until 128).map(t => ("a", t.toLong,
        10.0 + math.sin(2 * math.Pi * t / 16) +
          (if (t == 100) 15.0 else 0.0))) ++
      (0 until 128).map(t => ("b", t.toLong, 5.0 + (t % 4) * 0.1))
    val df = rows.toDF("series", "t", "v").repartition(7)
    val out = new SRAnomalyDetector().setInputCol("v")
      .setOrderCol("t").setGroupCols(Array("series")).setThreshold(3.0)
      .transform(df)
    val anomalies = out.filter(col("is_anomaly"))
      .select("series", "t").as[(String, Long)].collect().toSet
    assert(anomalies.contains(("a", 100L)))
    assert(!anomalies.exists(_._1 == "b"))
    assert(out.count() == 256) // all rows preserved
  }
}
