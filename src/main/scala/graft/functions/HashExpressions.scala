package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, UnsafeArrayData}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native Catalyst expressions for hashing-heavy dedup primitives. */
object HashExpressions {

  private def toCol(e: Expression): Column =
    org.apache.spark.sql.graftshims.ColumnBridge.column(e)
  private def expr(c: Column): Expression =
    org.apache.spark.sql.graftshims.ColumnBridge.expression(c)

  // splitmix64 finalizer — shared bit-mixer for all hash families here
  @inline private[functions] def mix64(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Sorted distinct 64-bit hashes of the lowercase word k-shingles of
    * `text`, computed in ONE pass with no intermediate shingle strings,
    * token arrays, or per-element boxing. Equivalent pipeline
    * `array_sort(transform(array_distinct(shingle strings), xxhash64))`
    * costs O(words·k) string allocations per row in interpreted
    * higher-order functions; this is the dedup scan's hot loop at scale.
    */
  def hashedWordShingles(text: Column, k: Int): Column =
    toCol(HashedWordShingles(expr(text), k))

  /** Static impl shared by interpreted eval and generated code. */
  def shingleHashesImpl(s: org.apache.spark.unsafe.types.UTF8String,
                        k: Int): UnsafeArrayData = {
    val str = s.toString
    val n = str.length
    // 1. per-token hashes: FNV-1a over lowercased chars, whitespace-delimited
    var tokenHashes = new Array[Long](16)
    var nTok = 0
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L // FNV offset basis
        while (i < n && !Character.isWhitespace(str.charAt(i))) {
          h = (h ^ Character.toLowerCase(str.charAt(i))) * 0x100000001B3L
          i += 1
        }
        if (nTok == tokenHashes.length) {
          tokenHashes = java.util.Arrays.copyOf(tokenHashes, nTok * 2)
        }
        tokenHashes(nTok) = mix64(h)
        nTok += 1
      }
    }
    val nSh = nTok - k + 1
    if (nSh <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    // 2. k-window combined hash per shingle position
    val out = new Array[Long](nSh)
    var p = 0
    while (p < nSh) {
      var h = 0x87C37B91114253D5L
      var j = 0
      while (j < k) { h = mix64(h ^ tokenHashes(p + j)); j += 1 }
      out(p) = h
      p += 1
    }
    // 3. sort + dedupe in place
    java.util.Arrays.sort(out)
    var w = 1
    var r = 1
    while (r < nSh) {
      if (out(r) != out(w - 1)) { out(w) = out(r); w += 1 }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(
      if (w == nSh) out else java.util.Arrays.copyOf(out, w))
  }

  case class HashedWordShingles(child: Expression, k: Int)
      extends UnaryExpression {
    require(k > 0)
    override def dataType: DataType = ArrayType(LongType, containsNull = false)

    override def nullSafeEval(a: Any): Any =
      shingleHashesImpl(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k)

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.shingleHashesImpl($a, $k);")

    override protected def withNewChildInternal(c: Expression): HashedWordShingles =
      copy(child = c)
  }

  /** Charikar 64-bit SimHash of `text`, computed in ONE pass over the
    * characters: tokenize on Character.isWhitespace, hash each lowercased
    * token (FNV-1a + splitmix finalizer — the same token-hash family as
    * [[shingleHashesImpl]]), and majority-vote the 64 bit positions. No
    * token array, no string allocation, no per-element boxing — this runs
    * in the 100 TB document scan, so it must stay a fused codegen'd
    * projection (the former UDF forced a serialization boundary per row).
    */
  def simHash64(text: Column): Column = toCol(SimHash64(expr(text)))

  /** Static impl shared by interpreted eval and generated code. */
  def simHash64Impl(s: org.apache.spark.unsafe.types.UTF8String): Long = {
    val str = s.toString
    val n = str.length
    val acc = new Array[Int](64)
    var i = 0
    while (i < n) {
      while (i < n && Character.isWhitespace(str.charAt(i))) i += 1
      if (i < n) {
        var h = 0xCBF29CE484222325L // FNV offset basis
        while (i < n && !Character.isWhitespace(str.charAt(i))) {
          h = (h ^ Character.toLowerCase(str.charAt(i))) * 0x100000001B3L
          i += 1
        }
        val th = mix64(h)
        var b = 0
        while (b < 64) {
          if (((th >>> b) & 1L) == 1L) acc(b) += 1 else acc(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (acc(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType

    override def nullSafeEval(a: Any): Any =
      simHash64Impl(a.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"${ev.value} = graft.functions.HashExpressions.simHash64Impl($a);")

    override protected def withNewChildInternal(c: Expression): SimHash64 =
      copy(child = c)
  }

  /** Exact Jaccard similarity of two SORTED `array<long>` sets via a single
    * merge-intersect pass — no per-element boxing, no temp array allocation
    * (vs `array_intersect` which builds a hash set + result array per pair;
    * this runs on every candidate pair of an LSH bucket join, so it is the
    * dedup hot loop).
    */
  def sortedLongJaccard(a: Column, b: Column): Column =
    toCol(SortedLongJaccard(expr(a), expr(b)))

  case class SortedLongJaccard(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType

    override def nullSafeEval(x: Any, y: Any): Any = {
      val a = x.asInstanceOf[ArrayData]
      val b = y.asInstanceOf[ArrayData]
      val na = a.numElements(); val nb = b.numElements()
      var i = 0; var j = 0; var inter = 0
      while (i < na && j < nb) {
        val av = a.getLong(i); val bv = b.getLong(j)
        if (av == bv) { inter += 1; i += 1; j += 1 }
        else if (av < bv) i += 1
        else j += 1
      }
      val union = na + nb - inter
      if (union == 0) 1.0 else inter.toDouble / union
    }

    override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
        val av = ctx.freshName("av"); val bv = ctx.freshName("bv")
        val inter = ctx.freshName("inter"); val union = ctx.freshName("union")
        s"""
           |int $na = $a.numElements(); int $nb = $b.numElements();
           |int $i = 0; int $j = 0; int $inter = 0;
           |while ($i < $na && $j < $nb) {
           |  long $av = $a.getLong($i); long $bv = $b.getLong($j);
           |  if ($av == $bv) { $inter++; $i++; $j++; }
           |  else if ($av < $bv) { $i++; }
           |  else { $j++; }
           |}
           |int $union = $na + $nb - $inter;
           |${ev.value} = ($union == 0) ? 1.0 : ((double) $inter) / $union;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedLongJaccard =
      copy(left = l, right = r)
  }

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
