package graft.stages

import graft.TestBase
import graft.featurize._
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class StagesSuite extends TestBase {
  import spark.implicits._

  lazy val df = Seq(
    (1L, "a", 10.0, Seq(1, 2)),
    (2L, "b", 20.0, Seq(3)),
    (3L, "a", 30.0, Seq.empty[Int]),
    (4L, "c", 40.0, Seq(4, 5, 6))
  ).toDF("id", "cat", "v", "arr")

  test("SelectColumns keeps only listed columns") {
    val out = new SelectColumns().setCols(Seq("id", "v")).transform(df)
    assert(out.columns.toSeq == Seq("id", "v"))
    assert(out.count() == 4)
    intercept[IllegalArgumentException] {
      new SelectColumns().setCols(Seq("nope")).transform(df)
    }
  }

  test("DropColumns drops") {
    assert(new DropColumns().setCols(Seq("arr", "cat")).transform(df)
      .columns.toSeq == Seq("id", "v"))
  }

  test("RenameColumn renames") {
    val out = new RenameColumn().setInputCol("v").setOutputCol("value").transform(df)
    assert(out.columns.contains("value") && !out.columns.contains("v"))
  }

  test("Explode explodes arrays") {
    val out = new Explode().setInputCol("arr").setOutputCol("x").transform(df)
    assert(out.count() == 6) // empty array row dropped
    assert(out.schema("x").dataType == IntegerType)
  }

  test("Lambda + UDFTransformer compose") {
    val out = new UDFTransformer().setInputCols(Seq("v")).setOutputCol("v2")
      .setExpr(cs => cs.head * 2).transform(
        new Lambda().setTransform(_.filter(col("v") > 15.0)).transform(df))
    assert(out.select(sum("v2")).head.getDouble(0) == 180.0)
  }

  test("Repartition changes partition count") {
    assert(new Repartition().setN(2).transform(df).rdd.getNumPartitions == 2)
  }

  test("ClassBalancer weights = max/count") {
    val m: ClassBalancerModel = new ClassBalancer().setInputCol("cat").fit(df)
    val w = m.transform(df).select("cat", "weight").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(w("a") == 1.0 && w("b") == 2.0 && w("c") == 2.0)
  }

  test("EnsembleByKey mean per key") {
    val out = new EnsembleByKey().setKeys(Seq("cat")).setCols(Seq("v"))
      .setColNames(Seq("mv")).transform(df)
    val m = out.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(m("a") == 20.0 && m("b") == 20.0 && m("c") == 40.0)
  }

  test("EnsembleByKey re-join keeps original rows") {
    val out = new EnsembleByKey().setKeys(Seq("cat")).setCols(Seq("v"))
      .setColNames(Seq("mv")).setCollapseGroup(false).transform(df)
    assert(out.count() == 4 && out.columns.contains("mv"))
  }

  test("SummarizeData computes counts and moments") {
    val out = new SummarizeData().setExactUnique(true).transform(df.select("v"))
    val row = out.filter(col("Feature") === "v").head
    assert(row.getAs[Double]("count") == 4.0)
    assert(row.getAs[Double]("unique") == 4.0)
    assert(row.getAs[Double]("missing") == 0.0)
    assert(row.getAs[Double]("min") == 10.0 && row.getAs[Double]("max") == 40.0)
    assert(math.abs(row.getAs[Double]("mean") - 25.0) < 1e-9)
  }

  test("SummarizeData exactUnique split jobs match the singlePass stats") {
    // the concurrent path runs ONE mixed agg per column (count_distinct
    // alongside the decimal/moment sums — a split was tried r19 and
    // measured WORSE; Spark plans a single distinct group without an
    // Expand); every per-column job must be bit-identical to the
    // one-wide-agg singlePass path
    val stage = new SummarizeData().setExactUnique(true).setExactMoments(true)
    val in = df.select("id", "v")
    val split = stage.transform(in)
    val single = stage.setSinglePass(true).transform(in)
    assertDFEq(split, single)
  }

  test("CleanMissingData fills with mean") {
    val withNulls = Seq((1L, Some(10.0)), (2L, None), (3L, Some(20.0)))
      .toDF("id", "v")
    val m = new CleanMissingData().setInputCols(Seq("v")).setCleaningMode("Mean")
      .fit(withNulls)
    val filled = m.transform(withNulls).select("v").collect().map(_.getDouble(0))
    assert(filled.sorted.sameElements(Array(10.0, 15.0, 20.0)))
  }

  test("ValueIndexer round-trips through IndexToValue") {
    val m = new ValueIndexer().setInputCol("cat").setOutputCol("ci").fit(df)
    assert(m.levels.sameElements(Array("a", "b", "c")))
    val indexed = m.transform(df)
    assert(indexed.filter(col("cat") === "b").head.getAs[Int]("ci") == 1)
    val rt = new IndexToValue().setInputCol("ci").setOutputCol("cat2")
      .transform(indexed)
    assert(rt.filter(col("cat") =!= col("cat2")).count() == 0)
  }

  test("FixedMiniBatch + FlattenBatch round-trip") {
    val batched = new FixedMiniBatchTransformer().setBatchSize(3)
      .transform(df.select("id", "cat", "v"))
    assert(batched.schema("id").dataType.isInstanceOf[ArrayType])
    val flat = new FlattenBatch().transform(batched)
    assertDFEq(flat, df.select("id", "cat", "v"))
  }

  test("FixedMiniBatch buffered prefetch keeps all rows") {
    val batched = new FixedMiniBatchTransformer().setBatchSize(2).setBuffered(true)
      .transform(df.select("id"))
    val flat = new FlattenBatch().transform(batched)
    assert(flat.count() == 4)
  }

  test("DynamicMiniBatch keeps all rows") {
    val batched = new DynamicMiniBatchTransformer().setMaxBatchSize(2)
      .transform(df.select("id", "v"))
    val flat = new FlattenBatch().transform(batched)
    assertDFEq(flat, df.select("id", "v"))
  }

  test("TimeIntervalMiniBatch keeps all rows") {
    val batched = new TimeIntervalMiniBatchTransformer().setMillisToWait(50)
      .transform(df.select("id"))
    assert(new FlattenBatch().transform(batched).count() == 4)
  }

  test("PartitionConsolidator preserves row multiset") {
    val in = spark.range(0, 100, 1, 8).toDF("id")
    val out = new PartitionConsolidator().transform(in)
    assert(out.agg(sum("id")).head.getLong(0) == 4950L)
    assert(out.count() == 100)
  }

  test("StratifiedRepartition original mode keeps all rows") {
    val out = new StratifiedRepartition().setLabelCol("cat").setMode("original")
      .transform(df)
    assert(out.count() == 4)
  }

  test("StratifiedRepartition resolves a case-differing labelCol like " +
    "the analyzer (exact path's per-row getAs — review find)") {
    val skewed = spark.range(0, 20).toDF("id").withColumn("Lab", lit("big"))
      .union(spark.range(20, 24).toDF("id").withColumn("Lab", lit("small")))
    // configured 'lab' vs column 'Lab': requireCols accepts it under
    // the default case-insensitive resolver, so the executor-side
    // exact-name row accessor must too
    val out = new StratifiedRepartition().setLabelCol("lab")
      .setMode("equal").transform(skewed)
    assert(out.count() > 0)
  }

  test("StratifiedRepartition equal mode upsamples minorities to max count") {
    val skewed = spark.range(0, 90).toDF("id").withColumn("lab", lit("big"))
      .union(spark.range(90, 100).toDF("id").withColumn("lab", lit("small")))
    val out = new StratifiedRepartition().setLabelCol("lab").setMode("equal")
      .transform(skewed)
    val counts = out.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fractions = max(maxCount, nParts)/count with replacement (exact)
    val target = math.max(90L, skewed.rdd.getNumPartitions.toLong)
    assert(math.abs(counts("small") - target) <= 2)
    assert(math.abs(counts("big") - target) <= 2)
  }

  test("StratifiedRepartition mixed mode equalizes per-label contributions") {
    val skewed = spark.range(0, 90).toDF("id").withColumn("lab", lit("big"))
      .union(spark.range(90, 100).toDF("id").withColumn("lab", lit("small")))
    // exact path: sampleByKeyExact honors the fractions to the row
    val out = new StratifiedRepartition().setLabelCol("lab").setMode("mixed")
      .setExactCounts(true).transform(skewed)
    val counts = out.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // fractions = equal-fractions / mean → each label yields ~target/mean rows
    assert(math.abs(counts("big") - counts("small")) <= 3)
    // native path: Bernoulli/Poisson sampling has variance; assert the
    // blend direction (small upsampled toward big), not exact counts
    val nat = new StratifiedRepartition().setLabelCol("lab").setMode("mixed")
      .transform(skewed)
    val natCounts = nat.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(natCounts("small") > 10 && natCounts("big") < 90,
      s"mixed blend off: $natCounts")
  }

  test("StratifiedRepartition native path: codegen plan, rows preserved, labels spread") {
    val df = spark.range(0, 200).toDF("id")
      .withColumn("lab", when(col("id") % 10 === 0, "rare").otherwise("common"))
      .repartition(4)
    val st = new StratifiedRepartition().setLabelCol("lab").setMode("original")
    val out = st.transform(df)
    // no RDD round-trip in the plan: the whole thing stays in Catalyst
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("ExistingRDD"), s"RDD scan leaked into plan:\n$plan")
    // original mode keeps the exact row multiset
    assert(out.groupBy("lab").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap ==
      Map("rare" -> 20L, "common" -> 180L))
    // every label is spread across more than one partition
    import org.apache.spark.sql.functions.spark_partition_id
    val spread = out.withColumn("p", spark_partition_id())
      .groupBy("lab").agg(countDistinct("p").as("nparts")).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(spread.values.forall(_ > 1), s"labels not spread: $spread")
  }

  test("Cacher caches and Timer times") {
    val t = new Timer().setStage(new SelectColumns().setCols(Seq("id")))
      .setMaterialize(true)
    val out = t.transform(new Cacher().transform(df))
    assert(out.count() == 4 && t.lastElapsedMs >= 0)
  }

  test("DataConversion casts and formats dates") {
    val d = Seq(("2024-01-02 03:04:05", 1.9)).toDF("ts", "x")
    val parsed = new DataConversion().setCols(Seq("ts")).setConvertTo("date")
      .setDateTimeFormat("yyyy-MM-dd HH:mm:ss").transform(d)
    assert(parsed.schema("ts").dataType == TimestampType)
    val casted = new DataConversion().setCols(Seq("x")).setConvertTo("integer")
      .transform(d)
    assert(casted.head.getAs[Int]("x") == 1)
  }
}
