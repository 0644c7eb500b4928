package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodeGenerator, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for the vector hot path.
  *
  * Spark's higher-order functions (`zip_with` + `aggregate`) are evaluated
  * interpreted with per-element boxing, which dominates runtime when a
  * similarity join evaluates millions of pairs. These expressions compute
  * dot / cosine / L2 in ONE primitive loop over the underlying `ArrayData`,
  * with full `doGenCode` support so they stay inside whole-stage codegen
  * (SURVEY.md §4 "custom Expression beats UDF"). Supported element types:
  * float and double arrays (mixed sides allowed).
  */
object VectorExpressions {

  private def elemAccessor(dt: DataType, arr: String, i: String): String =
    dt match {
      case ArrayType(FloatType, _)  => s"(double) $arr.getFloat($i)"
      case ArrayType(DoubleType, _) => s"$arr.getDouble($i)"
      case other => throw new IllegalArgumentException(
        s"vector expression needs array<float|double>, got $other")
    }

  private def elemAt(dt: DataType, arr: ArrayData, i: Int): Double =
    dt match {
      case ArrayType(FloatType, _)  => arr.getFloat(i).toDouble
      case ArrayType(DoubleType, _) => arr.getDouble(i)
      case other => throw new IllegalArgumentException(
        s"vector expression needs array<float|double>, got $other")
    }

  // classic-Column ⇄ Expression bridge (Spark 4 column-node API)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftshims.ColumnBridge.expression(c)
  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftshims.ColumnBridge.column(e)

  /** Column API: dot product of two float/double array columns. */
  def dot(a: Column, b: Column): Column = toCol(VectorDot(expr(a), expr(b)))

  def cosine(a: Column, b: Column): Column = toCol(VectorCosine(expr(a), expr(b)))

  def l2Distance(a: Column, b: Column): Column =
    toCol(VectorL2Distance(expr(a), expr(b)))

  def l2Norm(a: Column): Column = toCol(VectorL2Norm(expr(a)))

  /** Sign-bit LSH signature against fixed hyperplanes, one pass. */
  def hyperplaneSignature(v: Column, planes: Array[Array[Double]]): Column =
    toCol(HyperplaneSignBits(expr(v), planes))

  case class VectorDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) { s += elemAt(left.dataType, x, i) * elemAt(right.dataType, y, i); i += 1 }
      s
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n"); val s = ctx.freshName("s")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  $s += ${elemAccessor(left.dataType, a, i)} * ${elemAccessor(right.dataType, b, i)};
           |}
           |${ev.value} = $s;
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorDot =
      copy(left = l, right = r)
  }

  case class VectorCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        val xv = elemAt(left.dataType, x, i); val yv = elemAt(right.dataType, y, i)
        d += xv * yv; na += xv * xv; nb += yv * yv; i += 1
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val d = ctx.freshName("d"); val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $d = 0.0; double $na = 0.0; double $nb = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $xv = ${elemAccessor(left.dataType, a, i)};
           |  double $yv = ${elemAccessor(right.dataType, b, i)};
           |  $d += $xv * $yv; $na += $xv * $xv; $nb += $yv * $yv;
           |}
           |${ev.value} = $d / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorCosine =
      copy(left = l, right = r)
  }

  case class VectorL2Distance(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any, b: Any): Any = {
      val (x, y) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        val dv = elemAt(left.dataType, x, i) - elemAt(right.dataType, y, i)
        s += dv * dv; i += 1
      }
      math.sqrt(s)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val n = ctx.freshName("n")
        val s = ctx.freshName("s"); val dv = ctx.freshName("dv")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
           |double $s = 0.0;
           |for (int $i = 0; $i < $n; $i++) {
           |  double $dv = ${elemAccessor(left.dataType, a, i)} - ${elemAccessor(right.dataType, b, i)};
           |  $s += $dv * $dv;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression): VectorL2Distance =
      copy(left = l, right = r)
  }

  case class VectorL2Norm(child: Expression) extends UnaryExpression {
    override def dataType: DataType = DoubleType
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0
      while (i < x.numElements()) {
        val v = elemAt(child.dataType, x, i); s += v * v; i += 1
      }
      math.sqrt(s)
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val s = ctx.freshName("s"); val v = ctx.freshName("v")
        s"""
           |double $s = 0.0;
           |for (int $i = 0; $i < $a.numElements(); $i++) {
           |  double $v = ${elemAccessor(child.dataType, a, i)};
           |  $s += $v * $v;
           |}
           |${ev.value} = java.lang.Math.sqrt($s);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): VectorL2Norm =
      copy(child = c)
  }

  /** All-planes sign bits in one pass: bit i set iff v · planes(i) > 0.
    * The planes matrix ships as a codegen reference object (flattened
    * row-major double[] + dim), so the generated loop is pure primitive. */
  case class HyperplaneSignBits(child: Expression, planes: Array[Array[Double]])
      extends UnaryExpression {
    require(planes.nonEmpty && planes.length <= 64, "1..64 planes")
    override def dataType: DataType = LongType
    private lazy val dim = planes.head.length
    private lazy val flat: Array[Double] = planes.flatten
    override def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), dim)
      var bits = 0L; var p = 0
      while (p < planes.length) {
        var s = 0.0; var i = 0; val off = p * dim
        while (i < n) { s += elemAt(child.dataType, x, i) * flat(off + i); i += 1 }
        if (s > 0) bits |= (1L << p)
        p += 1
      }
      bits
    }
    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val flatRef = ctx.addReferenceObj("planesFlat", flat, "double[]")
      val nPlanes = planes.length
      nullSafeCodeGen(ctx, ev, a => {
        val i = ctx.freshName("i"); val p = ctx.freshName("p")
        val s = ctx.freshName("s"); val bits = ctx.freshName("bits")
        val n = ctx.freshName("n"); val off = ctx.freshName("off")
        s"""
           |int $n = java.lang.Math.min($a.numElements(), $dim);
           |long $bits = 0L;
           |for (int $p = 0; $p < $nPlanes; $p++) {
           |  double $s = 0.0; int $off = $p * $dim;
           |  for (int $i = 0; $i < $n; $i++) {
           |    $s += ${elemAccessor(child.dataType, a, i)} * $flatRef[$off + $i];
           |  }
           |  if ($s > 0) $bits |= (1L << $p);
           |}
           |${ev.value} = $bits;
         """.stripMargin
      })
    }
    override protected def withNewChildInternal(c: Expression): HyperplaneSignBits =
      copy(child = c)
  }
}
