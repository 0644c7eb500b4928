package graft.text

import graft.core._
import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param._
import org.apache.spark.ml.util.Identifiable
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Unicode normalization (NFC/NFD/NFKC/NFKD) + optional lowercase
  * (ref: core/.../stages/UnicodeNormalize.scala:52-71). No built-in
  * expression exists, so a native codegen'd one
  * ([[graft.functions.TextExpressions.UnicodeNormalizeExpr]]) keeps this
  * per-document op fused into the scan instead of crossing a UDF boundary.
  */
class UnicodeNormalize(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("UnicodeNormalize"))

  final val form = new Param[String](this, "form", "NFC|NFD|NFKC|NFKD",
    ParamValidators.inArray(Array("NFC", "NFD", "NFKC", "NFKD")))
  setDefault(form -> "NFC")
  def setForm(v: String): this.type = set(form, v)
  final val lower = new BooleanParam(this, "lower", "lowercase after normalize")
  setDefault(lower -> true)
  def setLower(v: Boolean): this.type = set(lower, v)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn(getOutputCol, graft.functions.TextExpressions
      .unicodeNormalize(col(getInputCol), $(form), $(lower)))
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, StringType, true))
  override def copy(extra: ParamMap): UnicodeNormalize = defaultCopy(extra)
}
object UnicodeNormalize extends graft.core.GraftReadable[UnicodeNormalize]


/** Trie-based multi-substring replacement: longest match wins, scanning
  * left-to-right, with a normalization function applied per char
  * (ref: core/.../stages/TextPreprocessor.scala:17-89,131-144). The trie is
  * broadcast once per query; lookup is O(text length × max key length).
  */
class TextPreprocessor(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("TextPreprocessor"))

  final val normFunc = new Param[String](this, "normFunc",
    "identity | lowercase", ParamValidators.inArray(Array("identity", "lowercase")))
  setDefault(normFunc -> "identity")
  def setNormFunc(v: String): this.type = set(normFunc, v)

  final val mapParam = new Param[Map[String, String]](this, "mapParam",
    "substring -> replacement map")
  setDefault(mapParam -> Map.empty[String, String])
  private def map: Map[String, String] = $(mapParam)
  def setMap(m: Map[String, String]): this.type = set(mapParam, m)
  def getMap: Map[String, String] = map

  override def transform(ds: Dataset[_]): DataFrame = {
    val norm: Char => Char =
      if ($(normFunc) == "lowercase") c => c.toLower else identity
    val trie = Trie.build(map, norm)
    // the trie ships inside the codegen'd expression (one deserialization
    // per task — replacement maps are param-sized, not data-sized)
    ds.toDF().withColumn(getOutputCol,
      graft.functions.TextExpressions.trieReplace(col(getInputCol), trie))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+ StructField(getOutputCol, StringType, true))
  override def copy(extra: ParamMap): TextPreprocessor = defaultCopy(extra)
}
object TextPreprocessor extends graft.core.GraftReadable[TextPreprocessor]


/** Immutable trie for longest-match-wins multi-substring replace. */
private[graft] case class Trie(children: Map[Char, Trie], value: Option[String]) {
  def replaceAll(text: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < text.length) {
      // walk the trie as deep as possible, remember last terminal hit
      var node: Trie = this
      var j = i
      var lastEnd = -1
      var lastVal: String = null
      var continue = true
      while (continue && j < text.length) {
        node.children.get(text.charAt(j)) match {
          case Some(n) =>
            node = n; j += 1
            n.value.foreach { v => lastEnd = j; lastVal = v }
          case None => continue = false
        }
      }
      if (lastEnd > i) { sb.append(lastVal); i = lastEnd }
      else { sb.append(text.charAt(i)); i += 1 }
    }
    sb.toString
  }
}
private[graft] object Trie {
  def build(map: Map[String, String], norm: Char => Char): Trie = {
    def insert(t: Trie, key: List[Char], v: String): Trie = key match {
      case Nil => t.copy(value = Some(v))
      case c :: rest =>
        val child = t.children.getOrElse(c, Trie(Map.empty, None))
        t.copy(children = t.children.updated(c, insert(child, rest, v)))
    }
    map.foldLeft(Trie(Map.empty, None)) { case (t, (k, v)) =>
      insert(t, k.map(norm).toList, v)
    }
  }
}

/** Split long text into ~[min,max]-char pages on word boundaries
  * (ref: featurize/text/PageSplitter.scala:58-101). Returns
  * array<string>; rows stay on their partitions (narrow op).
  */
class PageSplitter(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("PageSplitter"))

  final val maximumPageLength = new IntParam(this, "maximumPageLength", "",
    ParamValidators.gt(0))
  final val minimumPageLength = new IntParam(this, "minimumPageLength", "",
    ParamValidators.gt(0))
  final val boundaryRegex = new Param[String](this, "boundaryRegex", "")
  setDefault(maximumPageLength -> 5000, minimumPageLength -> 4500,
    boundaryRegex -> "\\s")
  def setMaximumPageLength(v: Int): this.type = set(maximumPageLength, v)
  def setMinimumPageLength(v: Int): this.type = set(minimumPageLength, v)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.toDF().withColumn(getOutputCol, graft.functions.TextExpressions
      .pageSplit(col(getInputCol), $(maximumPageLength),
        $(minimumPageLength), $(boundaryRegex)))
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+
      StructField(getOutputCol, ArrayType(StringType, true), true))
  override def copy(extra: ParamMap): PageSplitter = defaultCopy(extra)
}
object PageSplitter extends graft.core.GraftReadable[PageSplitter]


/** Concatenated n-grams for several n values
  * (ref: featurize/text/MultiNGram.scala:45-63). Built entirely from
  * native expressions: transform(filter(sliding windows)) via SQL
  * higher-order functions instead of the reference's per-row map.
  */
class MultiNGram(override val uid: String) extends Transformer
    with HasInputCol with HasOutputCol with graft.core.GraftWritable {
  def this() = this(Identifiable.randomUID("MultiNGram"))

  final val lengths = new IntArrayParam(this, "lengths", "n-gram sizes")
  setDefault(lengths -> Array(1, 2, 3))
  def setLengths(v: Seq[Int]): this.type = set(lengths, v.toArray)

  override def transform(ds: Dataset[_]): DataFrame = {
    val in = col(getInputCol)
    val grams = $(lengths).toIndexedSeq.map { n =>
      // per start position i, join tokens [i, i+n); drop tails shorter than n
      org.apache.spark.sql.functions.filter(
        org.apache.spark.sql.functions.transform(in,
          (_: Column, i: Column) => array_join(slice(in, i + 1, lit(n)), " ")),
        (_: Column, i: Column) => i <= size(in) - n)
    }
    ds.toDF().withColumn(getOutputCol, concat(grams: _*))
  }
  override def transformSchema(schema: StructType): StructType =
    StructType(schema :+
      StructField(getOutputCol, ArrayType(StringType, true), true))
  override def copy(extra: ParamMap): MultiNGram = defaultCopy(extra)
}
object MultiNGram extends graft.core.GraftReadable[MultiNGram]

