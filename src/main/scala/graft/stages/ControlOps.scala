package graft.stages

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** `df.cache()` as a pipeline stage with a disable flag
  * (ref: core/.../stages/Cacher.scala:26-34).
  */
class Cacher(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("Cacher"))

  final val disable = new BooleanParam(this, "disable", "skip caching")
  setDefault(disable -> false)
  def setDisable(v: Boolean): this.type = set(disable, v)

  override def transform(ds: Dataset[_]): DataFrame =
    if ($(disable)) ds.toDF() else ds.toDF().cache()
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): Cacher = defaultCopy(extra)
}
object Cacher extends DefaultParamsReadable[Cacher]

/** `coalesce` when shrinking (no shuffle) else shuffle `repartition`
  * (ref: core/.../stages/Repartition.scala:49-59). At scale, prefer
  * coalesce for write fan-in; full repartition only to fix severe skew.
  */
class Repartition(override val uid: String) extends Transformer
    with DefaultParamsWritable {
  def this() = this(Identifiable.randomUID("Repartition"))

  final val n = new IntParam(this, "n", "target partition count",
    ParamValidators.gt(0))
  def setN(v: Int): this.type = set(n, v)
  final val disable = new BooleanParam(this, "disable", "no-op if true")
  setDefault(disable -> false)
  def setDisable(v: Boolean): this.type = set(disable, v)

  override def transform(ds: Dataset[_]): DataFrame = {
    val df = ds.toDF()
    if ($(disable)) df
    else if ($(n) < df.rdd.getNumPartitions) df.coalesce($(n))
    else df.repartition($(n))
  }
  override def transformSchema(schema: StructType): StructType = schema
  override def copy(extra: ParamMap): Repartition = defaultCopy(extra)
}
object Repartition extends DefaultParamsReadable[Repartition]

/** Arbitrary `DataFrame => DataFrame` function as a stage; schema inferred
  * by a dry run on an empty frame when not given explicitly
  * (ref: core/.../stages/Lambda.scala:16-64). Essential composition glue.
  */
class Lambda(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("Lambda"))

  private var fn: DataFrame => DataFrame = identity
  private var schemaFn: Option[StructType => StructType] = None
  def setTransform(f: DataFrame => DataFrame): this.type = { fn = f; this }
  def setSchemaTransform(f: StructType => StructType): this.type = {
    schemaFn = Some(f); this
  }

  override def transform(ds: Dataset[_]): DataFrame = fn(ds.toDF())
  override def transformSchema(schema: StructType): StructType =
    schemaFn.map(_(schema)).getOrElse {
      // dry run on an empty local frame, as the reference does
      val spark = org.apache.spark.sql.SparkSession.active
      fn(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)).schema
    }
  override def copy(extra: ParamMap): Lambda = {
    val c = new Lambda(uid); c.fn = fn; c.schemaFn = schemaFn; c
  }
}

/** Apply a Spark SQL `UserDefinedFunction` (or any Column expression) to
  * input columns (ref: core/.../stages/UDFTransformer.scala:91-108).
  * Prefer `setExpr` (native Column expressions, codegen'd) over `setUDF`.
  */
class UDFTransformer(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol {
  def this() = this(Identifiable.randomUID("UDFTransformer"))

  private var udfOpt: Option[org.apache.spark.sql.expressions.UserDefinedFunction] = None
  private var exprOpt: Option[Seq[Column] => Column] = None
  def setUDF(u: org.apache.spark.sql.expressions.UserDefinedFunction): this.type = {
    udfOpt = Some(u); this
  }
  def setExpr(f: Seq[Column] => Column): this.type = { exprOpt = Some(f); this }

  private def outCol(ins: Seq[Column]): Column = (exprOpt, udfOpt) match {
    case (Some(f), _) => f(ins)
    case (_, Some(u)) => u(ins: _*)
    case _ => throw new IllegalStateException("UDFTransformer: no function set")
  }

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn(getOutputCol, outCol(getInputCols.toIndexedSeq.map(col)))
  override def transformSchema(schema: StructType): StructType = {
    val spark = org.apache.spark.sql.SparkSession.active
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .withColumn(getOutputCol, outCol(getInputCols.toIndexedSeq.map(col))).schema
  }
  override def copy(extra: ParamMap): UDFTransformer = {
    val c = new UDFTransformer(uid); c.udfOpt = udfOpt; c.exprOpt = exprOpt
    copyValues(c, extra)
  }
}

/** Times the wrapped stage's transform, logging elapsed wall time; optional
  * materialization via cache+count (ref: core/.../stages/Timer.scala:55-133).
  */
class Timer(override val uid: String) extends Transformer {
  def this() = this(Identifiable.randomUID("Timer"))

  private var stage: Transformer = _
  def setStage(t: Transformer): this.type = { stage = t; this }
  final val materialize = new BooleanParam(this, "materialize",
    "cache+count the output to force evaluation inside the timed span")
  setDefault(materialize -> false)
  def setMaterialize(v: Boolean): this.type = set(materialize, v)
  @volatile var lastElapsedMs: Long = -1L

  override def transform(ds: Dataset[_]): DataFrame = {
    val t0 = System.nanoTime()
    var out = stage.transform(ds)
    if ($(materialize)) { out = out.cache(); out.count() }
    lastElapsedMs = (System.nanoTime() - t0) / 1000000L
    logInfo(s"Timer[${stage.uid}]: ${lastElapsedMs}ms")
    out
  }
  override def transformSchema(schema: StructType): StructType =
    stage.transformSchema(schema)
  override def copy(extra: ParamMap): Timer = {
    val c = new Timer(uid); c.stage = if (stage == null) null else stage.copy(extra)
    copyValues(c, extra)
  }
}
