package graft.plans

import graft.functions.{HashExpressions, VectorExpressions}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** Registers graft's native codegen'd expressions as SQL functions, so
  * pure-SQL users get the same single-pass kernels the DataFrame API
  * uses:
  *
  * {{{
  * spark.sql("SELECT vec_cosine(a.embedding, b.embedding) FROM ...")
  * spark.sql("SELECT minhash_signature(shingle_hashes(text, 3), 128) ...")
  * }}}
  *
  * Install with
  * `SparkSession.builder.withExtensions(new GraftExtensions)` or
  * `spark.sql.extensions=graft.plans.GraftExtensions` — the standard
  * SparkSessionExtensions seam, nothing reflection-hacked.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, name: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$name must be an integer literal, got $other")
  }

  private def register(ext: SparkSessionExtensions, name: String,
      usage: String, builder: Seq[Expression] => Expression): Unit =
    ext.injectFunction((FunctionIdentifier(name),
      new ExpressionInfo("graft", name, usage),
      (children: Seq[Expression]) => builder(children)))

  override def apply(ext: SparkSessionExtensions): Unit = {
    register(ext, "vec_dot",
      "vec_dot(a, b) - dot product of two float/double array columns",
      { case Seq(a, b) => VectorExpressions.VectorDot(a, b) })
    register(ext, "vec_cosine",
      "vec_cosine(a, b) - cosine similarity of two array columns",
      { case Seq(a, b) => VectorExpressions.VectorCosine(a, b) })
    register(ext, "vec_l2_distance",
      "vec_l2_distance(a, b) - euclidean distance of two array columns",
      { case Seq(a, b) => VectorExpressions.VectorL2Distance(a, b) })
    register(ext, "vec_l2_norm",
      "vec_l2_norm(a) - euclidean norm of an array column",
      { case Seq(a) => VectorExpressions.VectorL2Norm(a) })
    register(ext, "shingle_hashes",
      "shingle_hashes(text, k) - sorted distinct 64-bit hashes of word k-shingles",
      { case Seq(t, k) => HashExpressions.HashedWordShingles(t, intLit(k, "k")) })
    register(ext, "minhash_signature",
      "minhash_signature(hashes, n) - n-entry minhash signature of a sorted hash array",
      { case Seq(h, n) =>
        HashExpressions.MinHashSignature(h, intLit(n, "numHashes")) })
    register(ext, "jaccard_sorted",
      "jaccard_sorted(a, b) - exact Jaccard of two SORTED long arrays",
      { case Seq(a, b) => HashExpressions.SortedLongJaccard(a, b) })
  }
}
