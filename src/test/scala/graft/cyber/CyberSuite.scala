package graft.cyber

import graft.TestBase
import org.apache.spark.sql.functions._

class CyberSuite extends TestBase {
  import spark.implicits._

  private def accesses = Seq(
    ("t1", 1L, "a"), ("t1", 1L, "a"), ("t1", 1L, "b"), ("t1", 2L, "a"),
    ("t2", 1L, "x"), ("t2", 2L, "y")
  ).toDF("tenant", "user", "res")

  test("PerTenantStandardScaler z-scores within tenant") {
    val df = Seq(("t1", 1.0), ("t1", 2.0), ("t1", 3.0),
      ("t2", 10.0), ("t2", 20.0)).toDF("tenant", "v")
    val out = new PerTenantStandardScaler().setTenantCol("tenant")
      .setInputCol("v").setOutputCol("z").transform(df)
      .select("tenant", "v", "z").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(math.abs(out(("t1", 2.0))) < 1e-12)          // the mean
    assert(math.abs(out(("t1", 3.0)) - 1.0) < 1e-12)    // +1 sd (sd=1)
    assert(math.abs(out(("t2", 10.0)) + math.sqrt(0.5)) < 1e-12)
  }

  test("PerTenantMinMaxScaler rescales to [0,1] per tenant") {
    val df = Seq(("t1", 5.0), ("t1", 15.0), ("t2", 7.0))
      .toDF("tenant", "v")
    val out = new PerTenantMinMaxScaler().setTenantCol("tenant")
      .setInputCol("v").setOutputCol("s").transform(df)
      .select("tenant", "v", "s").collect()
      .map(r => (r.getString(0), r.getDouble(1)) -> r.getDouble(2)).toMap
    assert(out(("t1", 5.0)) == 0.0 && out(("t1", 15.0)) == 1.0)
    assert(out(("t2", 7.0)) == 0.0) // degenerate tenant -> min
  }

  test("PerTenantIdIndexer assigns contiguous per-tenant ids") {
    val out = new PerTenantIdIndexer().setTenantCol("tenant")
      .setInputCol("res").setOutputCol("rid").transform(accesses)
      .select("tenant", "res", "rid").distinct().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out(("t1", "a")) == 1 && out(("t1", "b")) == 2)
    assert(out(("t2", "x")) == 1 && out(("t2", "y")) == 2)
  }

  test("ComplementAccessTransformer emits exactly the unobserved pairs") {
    val out = new ComplementAccessTransformer().setTenantCol("tenant")
      .setUserCol("user").setResCol("res").transform(accesses)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    // t1: users {1,2} × res {a,b} minus observed {(1,a),(1,b),(2,a)} = (2,b)
    // t2: users {1,2} × res {x,y} minus observed {(1,x),(2,y)} = (1,y),(2,x)
    assert(out == Set(("t1", 2L, "b"), ("t2", 1L, "y"), ("t2", 2L, "x")))
  }

  test("AccessAnomaly scores unseen pairs as more anomalous on average") {
    // two clear access communities per tenant
    val rnd = new scala.util.Random(11)
    val rows = (for {
      u <- 0 until 10; r <- 0 until 10
      if (u < 5) == (r < 5) // community structure
      _ <- 0 until (1 + rnd.nextInt(3))
    } yield ("t", u.toLong, s"r$r")).toDF("tenant", "user", "res")
    val scored = new AccessAnomaly().setTenantCol("tenant")
      .setUserCol("user").setResCol("res").setRank(4)
      .transform(rows)
    assert(scored.columns.contains("anomaly_score"))
    assert(scored.count() == rows.select("tenant", "user", "res").distinct().count())
    // in-community scores exist and are finite
    assert(scored.filter(col("anomaly_score").isNaN).count() == 0)
  }

  test("planted-access fixture keeps margin from the top-4 gate boundary") {
    // The EXACT construction of the access_anomaly_planted driver gate
    // (ids 0..999 -> two 10-user communities × 5 home resources, 10
    // accesses each; 4 single cross-community accesses planted). The
    // gate takes top-4 by anomaly score; it is robust only if the lowest
    // planted score clears the highest intra score by a real margin, not
    // by ALS float luck — assert the gap.
    val base = spark.range(0, 1000).toDF("id")
      .select(pmod(col("id"), lit(20)).cast("int").as("user"),
        (pmod(floor(col("id") / 20), lit(5)) +
          lit(5) * floor(pmod(col("id"), lit(20)) / 10))
          .cast("int").as("res"))
    val plantedPairs = Set((0, 7), (3, 9), (12, 1), (17, 4))
    val planted = plantedPairs.toSeq.toDF("user", "res")
    val scored = new AccessAnomaly().setTenantCol("tenant")
      .setUserCol("user").setResCol("res").setRank(4).setMaxIter(5)
      .setNumBlocks(2)
      .transform(base.union(planted).withColumn("tenant", lit(0)))
      .select("user", "res", "anomaly_score").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2))
    val (plantedScores, intraScores) =
      scored.partition { case (pair, _) => plantedPairs(pair) }
    val lowestPlanted = plantedScores.map(_._2).min
    val highestIntra = intraScores.map(_._2).max
    assert(plantedScores.length == 4)
    assert(lowestPlanted - highestIntra > 0.5,
      s"gate margin too thin: lowest planted $lowestPlanted vs " +
        s"highest intra $highestIntra")
  }
}
