package graft.core

import graft.TestBase
import org.apache.spark.sql.SparkSession

/** GraftExtensions SQL-function registration, exercised through a real
  * session built with `withExtensions` (new SessionState on the shared
  * SparkContext).
  */
class ExtensionsSuite extends TestBase {

  test("native expressions are callable from pure SQL") {
    val base = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions)
        .getOrCreate()
      val row = s.sql(
        """SELECT
          |  vec_dot(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d,
          |  round(vec_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)), 9) AS c,
          |  vec_l2_distance(array(0.0D, 0.0D), array(3.0D, 4.0D)) AS dist,
          |  vec_l2_norm(array(3.0D, 4.0D)) AS nrm,
          |  size(shingle_hashes('a b c d', 2)) AS nsh,
          |  size(minhash_signature(shingle_hashes('a b c d', 2), 16)) AS nmh,
          |  jaccard_sorted(array(1L, 2L, 3L), array(2L, 3L, 4L)) AS j
          |""".stripMargin).head
      assert(row.getDouble(0) == 11.0)
      assert(row.getDouble(1) == 1.0)
      assert(row.getDouble(2) == 5.0)
      assert(row.getDouble(3) == 5.0)
      assert(row.getInt(4) == 3)  // 'a b','b c','c d'
      assert(row.getInt(5) == 16)
      assert(row.getDouble(6) == 0.5) // |{2,3}| / |{1,2,3,4}|
      // non-literal arity argument is rejected with a clear message
      val err = intercept[Exception](
        s.sql("SELECT minhash_signature(array(1L), id + 1) FROM range(1)")
          .collect())
      assert(err.getMessage.contains("integer literal") ||
        Option(err.getCause).exists(_.getMessage.contains("integer literal")))
    } finally {
      SparkSession.setActiveSession(base)
      SparkSession.setDefaultSession(base)
    }
  }

  test("SchemaChecks honors spark.sql.caseSensitive (round-18 advice): " +
    "the analyzer's resolver, not exact string match") {
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(StructField("Text", StringType)))
    // default (case-insensitive): 'text' resolves against 'Text', and a
    // differently-cased reserved name still clashes
    graft.core.SchemaChecks.requireCols(schema, "inputCol" -> "text")
    intercept[IllegalArgumentException] {
      graft.core.SchemaChecks.requireAbsent(
        StructType(Seq(StructField("__FP", StringType))), "__fp")
    }
    // case-sensitive session: exact-match semantics come back
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val prev = conf.caseSensitiveAnalysis
    conf.setConf(org.apache.spark.sql.internal.SQLConf.CASE_SENSITIVE, true)
    try {
      intercept[IllegalArgumentException] {
        graft.core.SchemaChecks.requireCols(schema, "inputCol" -> "text")
      }
      graft.core.SchemaChecks.requireAbsent(
        StructType(Seq(StructField("__FP", StringType))), "__fp")
    } finally conf.setConf(
      org.apache.spark.sql.internal.SQLConf.CASE_SENSITIVE, prev)
  }
}
