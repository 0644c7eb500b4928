package graft.core

import org.apache.spark.ml.param._

/** Shared column-name param traits, the reference's operator-composition
  * convention (ref: core/.../core/contracts/Params.scala:1-208 — operators
  * communicate through configured column names and validate schema
  * functionally). Spark's own shared traits are private[ml], so we define
  * our own public ones.
  */
trait HasInputCol extends Params {
  final val inputCol: Param[String] =
    new Param[String](this, "inputCol", "name of the input column")
  final def getInputCol: String = $(inputCol)
  def setInputCol(v: String): this.type = set(inputCol, v)
}

trait HasOutputCol extends Params {
  final val outputCol: Param[String] =
    new Param[String](this, "outputCol", "name of the output column")
  final def getOutputCol: String = $(outputCol)
  def setOutputCol(v: String): this.type = set(outputCol, v)
}

trait HasInputCols extends Params {
  final val inputCols: StringArrayParam =
    new StringArrayParam(this, "inputCols", "names of the input columns")
  final def getInputCols: Array[String] = $(inputCols)
  def setInputCols(v: Array[String]): this.type = set(inputCols, v)
  def setInputCols(v: Seq[String]): this.type = set(inputCols, v.toArray)
}

trait HasOutputCols extends Params {
  final val outputCols: StringArrayParam =
    new StringArrayParam(this, "outputCols", "names of the output columns")
  final def getOutputCols: Array[String] = $(outputCols)
  def setOutputCols(v: Array[String]): this.type = set(outputCols, v.toArray)
}

trait HasLabelCol extends Params {
  final val labelCol: Param[String] =
    new Param[String](this, "labelCol", "name of the label column")
  final def getLabelCol: String = $(labelCol)
  def setLabelCol(v: String): this.type = set(labelCol, v)
}

trait HasFeaturesCol extends Params {
  final val featuresCol: Param[String] =
    new Param[String](this, "featuresCol", "name of the features column")
  setDefault(featuresCol -> "features")
  final def getFeaturesCol: String = $(featuresCol)
  def setFeaturesCol(v: String): this.type = set(featuresCol, v)
}

/** Fail-fast schema validation shared by every stage's transformSchema:
  * a forgotten setIdCol/setInputCol must surface at plan-construction
  * time with the role and column NAMED, not minutes into a 100x
  * transform as a raw unresolved-column error (the round-16/17 advice
  * pattern, swept family-wide in round 18). Error message style matches
  * the fingerprint family's, so suites can pin one wording. */
object SchemaChecks {
  import org.apache.spark.sql.types.StructType

  // name matching honors spark.sql.caseSensitive (the analyzer's own
  // resolver, case-INsensitive by default): a schema the analyzer would
  // resolve must not fail these checks, and a reserved-name clash the
  // analyzer would hit must not slip past them (round-18 advice)
  private def resolver: (String, String) => Boolean =
    org.apache.spark.sql.internal.SQLConf.get.resolver

  /** Require each (role, columnName) to exist in the schema. */
  def requireCols(schema: StructType, named: (String, String)*): Unit = {
    val r = resolver
    named.foreach { case (role, name) =>
      require(schema.fieldNames.exists(f => r(f, name)),
        s"$role '$name' not found in ${schema.fieldNames.mkString(", ")}")
    }
  }

  /** Require none of the internally-reserved names to be present. */
  def requireAbsent(schema: StructType, reserved: String*): Unit = {
    val r = resolver
    reserved.foreach(c => require(!schema.fieldNames.exists(f => r(f, c)),
      s"input already has a column named '$c' (reserved internally)"))
  }

  /** The schema's ACTUAL field name for a configured column, under the
    * session resolver — for code paths that index rows/schemas by
    * exact name (`fieldIndex`, `Row.getAs`) after a [[requireCols]]
    * that accepted a case-differing spelling: without this, a config
    * the analyzer (and requireCols) resolves would still throw at the
    * exact-match accessor — per executor TASK in the `Row.getAs` case
    * (review find). Falls back to the configured name when nothing
    * matches (the accessor's own error then names it). */
  def resolve(schema: StructType, name: String): String = {
    val r = resolver
    schema.fieldNames.find(f => r(f, name)).getOrElse(name)
  }
}
