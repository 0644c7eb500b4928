package graft.text

import graft.TestBase
import org.apache.spark.sql.functions._

class GroupQuotaSuite extends TestBase {
  import spark.implicits._

  private def docs = spark.range(100)
    .select(col("id").as("doc_id"),
      concat(lit("g"), pmod(col("id"), lit(4))).as("grp"),
      concat(lit("text "), col("id")).as("text"))

  private def windowTruth(cap: Int, salt: String): Map[String, Set[Long]] = {
    import org.apache.spark.sql.expressions.Window
    val key = md5(concat(col("doc_id").cast("string"), lit(":" + salt)))
    docs.withColumn("rn", row_number().over(
        Window.partitionBy("grp").orderBy(key, col("doc_id"))))
      .where(col("rn") <= cap)
      .select("grp", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
  }

  test("keeps exactly cap per group, matching the window-rank rule") {
    val kept = new GroupQuotaSampler().setGroupCol("grp").setCap(7)
      .transform(docs)
    assert(kept.columns.toSeq == docs.columns.toSeq) // schema unchanged
    val byGrp = kept.select("grp", "doc_id").as[(String, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val truth = windowTruth(7, "quota")
    assert(byGrp == truth)
    assert(byGrp.values.forall(_.size == 7))
  }

  test("groups under their cap pass through whole; salt redraws") {
    val kept = new GroupQuotaSampler().setGroupCol("grp").setCap(100)
      .transform(docs)
    assert(kept.count() == 100)
    val a = new GroupQuotaSampler().setGroupCol("grp").setCap(5)
      .transform(docs).select("doc_id").as[Long].collect().toSet
    val b = new GroupQuotaSampler().setGroupCol("grp").setCap(5)
      .setSalt("other").transform(docs).select("doc_id").as[Long]
      .collect().toSet
    assert(a != b, "independent salts should draw different survivors")
  }

  test("null groups are capped as their own group") {
    val withNull = docs.withColumn("grp",
      when(col("doc_id") < 50, col("grp")))
    val kept = new GroupQuotaSampler().setGroupCol("grp").setCap(3)
      .transform(withNull)
    val nullKept = kept.where(col("grp").isNull).count()
    assert(nullKept == 3L)
  }

  test("partitioning independence and missing-column guards") {
    val s = new GroupQuotaSampler().setGroupCol("grp").setCap(4)
    assertDFEq(s.transform(docs.repartition(11)),
      s.transform(docs.coalesce(1)))
    intercept[IllegalArgumentException] {
      s.transformSchema(docs.drop("grp").schema)
    }
    intercept[IllegalArgumentException] {
      new GroupQuotaSampler().setGroupCol("grp").setIdCol("nope")
        .transformSchema(docs.schema)
    }
  }
}
