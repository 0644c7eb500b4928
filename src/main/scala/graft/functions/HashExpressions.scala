package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for hashing-heavy dedup primitives. */
object HashExpressions {

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftshims.ColumnBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftshims.ColumnBridge.expression(c)

  /** MinHash signature of a pre-hashed shingle set (`array<long>`):
    * `numHashes` minima of the Kirsch-Mitzenmacher family
    * g_i(x) = x + i * mix(x), computed in ONE primitive pass
    * (vs `numHashes` interpreted `array_min(transform(...))` traversals).
    */
  def minHashSignature(hashedShingles: Column, numHashes: Int): Column =
    toCol(MinHashSignature(expr(hashedShingles), numHashes))

  case class MinHashSignature(child: Expression, numHashes: Int)
      extends UnaryExpression {
    require(numHashes > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    // splitmix64 finalizer as the second K-M hash
    @inline private def mix(x: Long): Long = {
      var z = x + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z ^ (z >>> 31)
    }

    override def nullSafeEval(a: Any): Any = {
      val arr = a.asInstanceOf[ArrayData]
      val mins = Array.fill(numHashes)(Long.MaxValue)
      var e = 0
      while (e < arr.numElements()) {
        val x = arr.getLong(e)
        val h2 = mix(x)
        var i = 0
        var g = x
        while (i < numHashes) {
          if (g < mins(i)) mins(i) = g
          g += h2; i += 1
        }
        e += 1
      }
      UnsafeArrayData.fromPrimitiveArray(mins)
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a => {
        val e = ctx.freshName("e"); val i = ctx.freshName("i")
        val x = ctx.freshName("x"); val z = ctx.freshName("z")
        val g = ctx.freshName("g"); val mins = ctx.freshName("mins")
        s"""
           |long[] $mins = new long[$numHashes];
           |java.util.Arrays.fill($mins, Long.MAX_VALUE);
           |for (int $e = 0; $e < $a.numElements(); $e++) {
           |  long $x = $a.getLong($e);
           |  long $z = $x + 0x9E3779B97F4A7C15L;
           |  $z = ($z ^ ($z >>> 30)) * 0xBF58476D1CE4E5B9L;
           |  $z = ($z ^ ($z >>> 27)) * 0x94D049BB133111EBL;
           |  $z = $z ^ ($z >>> 31);
           |  long $g = $x;
           |  for (int $i = 0; $i < $numHashes; $i++) {
           |    if ($g < $mins[$i]) $mins[$i] = $g;
           |    $g += $z;
           |  }
           |}
           |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         """.stripMargin
      })

    override protected def withNewChildInternal(c: Expression): MinHashSignature =
      copy(child = c)
  }
}
