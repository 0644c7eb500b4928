package graft.stages

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.types.StructType

/** Clone a unary (HasInputCol/HasOutputCol) stage across column pairs and
  * apply each clone in sequence (ref: stages/MultiColumnAdapter
  * .scala:106-133 — the reference builds a fitted Pipeline the same way).
  * All clones add lazy column expressions, so Catalyst still fuses the
  * whole chain into one projection.
  */
class MultiColumnAdapter(override val uid: String) extends Transformer
    with HasInputCols with HasOutputCols with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("MultiColumnAdapter"))

  final val baseStage = new Param[Transformer](this, "baseStage",
    "single-column stage replicated across the column pairs")
  private def base: Transformer with HasInputCol with HasOutputCol =
    get(baseStage).orNull
      .asInstanceOf[Transformer with HasInputCol with HasOutputCol]
  def setBaseStage(t: Transformer with HasInputCol with HasOutputCol): this.type =
    set(baseStage, t: Transformer)

  override def transform(ds: Dataset[_]): DataFrame = {
    require(base != null, "setBaseStage first")
    require($(inputCols).length == $(outputCols).length,
      "inputCols and outputCols must align")
    $(inputCols).zip($(outputCols)).foldLeft(ds.toDF()) {
      case (df, (in, out)) =>
        base.copy(ParamMap.empty)
          .asInstanceOf[Transformer with HasInputCol with HasOutputCol]
          .setInputCol(in).setOutputCol(out)
          .transform(df)
    }
  }
  override def transformSchema(schema: StructType): StructType =
    $(inputCols).zip($(outputCols)).foldLeft(schema) {
      case (s, (in, out)) =>
        base.copy(ParamMap.empty)
          .asInstanceOf[Transformer with HasInputCol with HasOutputCol]
          .setInputCol(in).setOutputCol(out).transformSchema(s)
    }
  override def copy(extra: ParamMap): MultiColumnAdapter = defaultCopy(extra)
}
object MultiColumnAdapter extends graft.core.GraftReadable[MultiColumnAdapter]

