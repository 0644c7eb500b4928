package graft.core

import org.apache.spark.ml.{Estimator, Model, Transformer}
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** Helper utilities mirroring the reference's DatasetExtensions + FluentAPI
  * (ref: core/.../core/schema/DatasetExtensions.scala:11-62,
  * core/.../core/spark/FluentAPI.scala:1-30).
  */
object DatasetExtensions {

  /** Pick a column name not already present, based on `base`. */
  def findUnusedColumnName(base: String, schema: StructType): String = {
    val names = schema.fieldNames.toSet
    if (!names.contains(base)) base
    else Iterator.from(1).map(i => s"${base}_$i").find(!names.contains(_)).get
  }

  def findUnusedColumnName(base: String, df: Dataset[_]): String =
    findUnusedColumnName(base, df.schema)

  implicit class MMLDataFrame(val df: DataFrame) extends AnyVal {
    /** `df.mlTransform(stage)` fluent sugar. */
    def mlTransform(stage: Transformer): DataFrame = stage.transform(df)
    def mlTransform(stages: Transformer*)(implicit d: DummyImplicit): DataFrame =
      stages.foldLeft(df)((cur, t) => t.transform(cur))
    def mlFit[M <: Model[M]](est: Estimator[M]): M = est.fit(df)
  }
}
