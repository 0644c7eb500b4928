package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the per-document text stages — these
  * run in the 100 TB scan path, so they must stay inside whole-stage
  * codegen rather than crossing a Scala-UDF serialization boundary per
  * row. Codegen references the expression instance itself
  * (`addReferenceObj`), so stateful pieces (a compiled Pattern, a
  * Normalizer form) are created once per task, not per row.
  */
object TextExpressions {

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftshims.ColumnBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftshims.ColumnBridge.expression(c)

  /** Unicode normalization (NFC/NFD/NFKC/NFKD) + optional lowercase. */
  def unicodeNormalize(text: Column, form: String, lower: Boolean): Column =
    toCol(UnicodeNormalizeExpr(expr(text), form, lower))

  case class UnicodeNormalizeExpr(child: Expression, form: String,
      lower: Boolean) extends UnaryExpression {
    override def dataType: DataType = StringType

    @transient private lazy val f = java.text.Normalizer.Form.valueOf(form)

    def normalize(s: UTF8String): UTF8String = {
      val n = java.text.Normalizer.normalize(s.toString, f)
      // Locale.ROOT: executors on tr/az-locale JVMs would otherwise map
      // 'I' -> 'ı', making the normalize stage environment-dependent
      UTF8String.fromString(
        if (lower) n.toLowerCase(java.util.Locale.ROOT) else n)
    }

    override def nullSafeEval(a: Any): Any =
      normalize(a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("unicodeNormalize", this,
        classOf[UnicodeNormalizeExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.normalize($a);")
    }

    override protected def withNewChildInternal(c: Expression): UnicodeNormalizeExpr =
      copy(child = c)
  }

  /** Longest-match-wins multi-substring replace over a prebuilt trie.
    * The trie ships inside the expression (codegen references array) —
    * one deserialization per task, zero per-row conversion.
    */
  def trieReplace(text: Column, trie: graft.text.Trie): Column =
    toCol(TrieReplaceExpr(expr(text), trie))

  case class TrieReplaceExpr(child: Expression, trie: graft.text.Trie)
      extends UnaryExpression {
    override def dataType: DataType = StringType

    def replace(s: UTF8String): UTF8String =
      UTF8String.fromString(trie.replaceAll(s.toString))

    override def nullSafeEval(a: Any): Any =
      replace(a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("trieReplace", this,
        classOf[TrieReplaceExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.replace($a);")
    }

    override protected def withNewChildInternal(c: Expression): TrieReplaceExpr =
      copy(child = c)
  }

  /** Greedy page split: cut at the last boundary-regex match in
    * (minLen, maxLen], hard cut at maxLen when none. */
  def pageSplit(text: Column, maxLen: Int, minLen: Int,
      boundaryRegex: String): Column =
    toCol(PageSplitExpr(expr(text), maxLen, minLen, boundaryRegex))

  case class PageSplitExpr(child: Expression, maxLen: Int, minLen: Int,
      boundaryRegex: String) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = true)

    @transient private lazy val re = boundaryRegex.r

    def split(s: UTF8String): ArrayData = {
      val pages = scala.collection.mutable.ArrayBuffer.empty[Any]
      var rest = s.toString
      while (rest.length > maxLen) {
        // last boundary in (minLen, maxLen]; hard cut if none
        val window = rest.substring(minLen, maxLen)
        val m = re.findAllMatchIn(window).toSeq.lastOption
        val cut = m.map(minLen + _.end).getOrElse(maxLen)
        pages += UTF8String.fromString(rest.substring(0, cut))
        rest = rest.substring(cut)
      }
      if (rest.nonEmpty || pages.isEmpty) pages += UTF8String.fromString(rest)
      new GenericArrayData(pages.toArray)
    }

    override def nullSafeEval(a: Any): Any =
      split(a.asInstanceOf[UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("pageSplit", this,
        classOf[PageSplitExpr].getName)
      nullSafeCodeGen(ctx, ev, a => s"${ev.value} = $ref.split($a);")
    }

    override protected def withNewChildInternal(c: Expression): PageSplitExpr =
      copy(child = c)
  }
}
