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
class Lambda(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("Lambda"))

  // function-valued params ride GraftWritable's complex.bin (Scala
  // lambdas are Serializable), so a Lambda in a persisted Pipeline keeps
  // its behavior across save/load like the reference's UDF params
  final val fn = new Param[DataFrame => DataFrame](this, "fn",
    "the transform function")
  setDefault(fn -> identity[DataFrame] _)
  final val schemaFn = new Param[StructType => StructType](this, "schemaFn",
    "optional schema transform (otherwise inferred by an empty dry run)")
  def setTransform(f: DataFrame => DataFrame): this.type = set(fn, f)
  def setSchemaTransform(f: StructType => StructType): this.type =
    set(schemaFn, f)

  override def transform(ds: Dataset[_]): DataFrame = $(fn)(ds.toDF())
  override def transformSchema(schema: StructType): StructType =
    get(schemaFn).map(_(schema)).getOrElse {
      // dry run on an empty local frame, as the reference does
      val spark = org.apache.spark.sql.SparkSession.active
      $(fn)(spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), schema)).schema
    }
  override def copy(extra: ParamMap): Lambda = defaultCopy(extra)
}
object Lambda extends graft.core.GraftReadable[Lambda]


/** Apply a Spark SQL `UserDefinedFunction` (or any Column expression) to
  * input columns (ref: core/.../stages/UDFTransformer.scala:91-108).
  * Prefer `setExpr` (native Column expressions, codegen'd) over `setUDF`.
  */
class UDFTransformer(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("UDFTransformer"))

  final val udfParam =
    new Param[org.apache.spark.sql.expressions.UserDefinedFunction](
      this, "udfParam", "the UDF to apply")
  final val exprParam = new Param[Seq[Column] => Column](this, "exprParam",
    "native Column expression builder (preferred: codegen'd)")
  def setUDF(u: org.apache.spark.sql.expressions.UserDefinedFunction): this.type =
    set(udfParam, u)
  def setExpr(f: Seq[Column] => Column): this.type = set(exprParam, f)

  private def outCol(ins: Seq[Column]): Column = (get(exprParam), get(udfParam)) match {
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
  override def copy(extra: ParamMap): UDFTransformer = defaultCopy(extra)
}
object UDFTransformer extends graft.core.GraftReadable[UDFTransformer]


/** Times the wrapped stage's transform, logging elapsed wall time; optional
  * materialization via cache+count (ref: core/.../stages/Timer.scala:55-133).
  */
class Timer(override val uid: String) extends Transformer with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("Timer"))

  final val stageParam = new Param[Transformer](this, "stageParam",
    "the wrapped stage to time")
  private def stage: Transformer = $(stageParam)
  def setStage(t: Transformer): this.type = set(stageParam, t)
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
    // Spark ML convention for nested stages (Pipeline.copy): deep-copy
    // the wrapped stage and propagate extra into it, so copies never
    // share a mutable Transformer
    val c = defaultCopy[Timer](extra)
    if (c.isSet(c.stageParam)) c.set(c.stageParam, c.stage.copy(extra))
    c
  }
}
object Timer extends graft.core.GraftReadable[Timer]

