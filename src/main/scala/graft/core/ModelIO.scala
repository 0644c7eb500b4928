package graft.core

import org.apache.hadoop.fs.Path
import org.apache.spark.ml.param._
import org.apache.spark.sql.SparkSession
import java.nio.charset.StandardCharsets

/** Minimal persistence helpers for fitted-model state (the reference
  * persists complex params through org/apache/spark/ml/Serializer
  * .scala:1-147; we write param JSON + typed state files under the model
  * path via the Hadoop FS API so save/load works on any DFS).
  */
object ModelIO {

  private def fs(spark: SparkSession, path: String) =
    new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)

  def writeText(spark: SparkSession, path: String, content: String): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    try out.write(content.getBytes(StandardCharsets.UTF_8)) finally out.close()
  }

  def readText(spark: SparkSession, path: String): String = {
    val in = fs(spark, path).open(new Path(path))
    try new String(in.readAllBytes(), StandardCharsets.UTF_8) finally in.close()
  }

  def writeObject(spark: SparkSession, path: String, obj: AnyRef): Unit = {
    val out = fs(spark, path).create(new Path(path), true)
    val oos = new java.io.ObjectOutputStream(out)
    try oos.writeObject(obj) finally oos.close()
  }

  def readObject[T](spark: SparkSession, path: String): T = {
    val in = fs(spark, path).open(new Path(path))
    val ois = new java.io.ObjectInputStream(in)
    try ois.readObject().asInstanceOf[T] finally ois.close()
  }

  /** JSON string-escape / unescape pair (kept together so they cannot
    * drift apart): quote, backslash, and ALL control chars — a newline
    * in a caller-supplied uid must not emit malformed metadata JSON
    * that only explodes later inside Pipeline.load. */
  def jsonEscape(s: String): String = {
    val sb = new StringBuilder
    s.foreach {
      case '"' => sb.append("\\\"")
      case '\\' => sb.append("\\\\")
      case c if c < ' ' => sb.append(f"\\u${c.toInt}%04x")
      case c => sb.append(c)
    }
    sb.toString
  }

  def jsonUnescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '"' => sb.append('"'); i += 2
          case '\\' => sb.append('\\'); i += 2
          case 'u' if i + 5 < s.length =>
            sb.append(Integer.parseInt(s.substring(i + 2, i + 6), 16).toChar)
            i += 6
          // standard short escapes: json4s (Spark's DefaultParamsWriter)
          // emits these, and GraftReader advertises reading Spark-written
          // metadata — \n must decode to a newline, not the two chars '\n'
          case 'n' => sb.append('\n'); i += 2
          case 't' => sb.append('\t'); i += 2
          case 'b' => sb.append('\b'); i += 2
          case 'f' => sb.append('\f'); i += 2
          case 'r' => sb.append('\r'); i += 2
          case '/' => sb.append('/'); i += 2
          case _ => sb.append(c); i += 1
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  // string arrays are encoded as unit-separator-joined values with a
  // sentinel prefix (our own format, only read back by this object)
  private val ArrayPrefix = "\u0000[]"

  /** Explicitly-set simple params as a JSON object (string values). */
  def paramsJson(stage: Params): String = {
    val entries = stage.params.toSeq.flatMap { p =>
      stage.get(p).collect {
        case v: String => p.name -> v
        case v: Int => p.name -> v.toString
        case v: Long => p.name -> v.toString
        case v: Double => p.name -> v.toString
        case v: Boolean => p.name -> v.toString
        case v: Array[String] => p.name -> (ArrayPrefix + v.mkString("\u001f"))
      }
    }
    // jsonEscape (not a bare quote/backslash replace): the U+0000 array
    // sentinel, U+001F separators, and any control char in a string param
    // must leave params.json valid JSON
    entries.map { case (k, v) =>
      "\"" + k + "\":\"" + jsonEscape(v) + "\""
    }.mkString("{", ",", "}")
  }

  private val Entry = """"((?:[^"\\]|\\.)*)"\s*:\s*"((?:[^"\\]|\\.)*)"""".r

  def setParamsFromJson(stage: Params, json: String): Unit =
    Entry.findAllMatchIn(json).foreach { m =>
      val name = m.group(1)
      val raw = jsonUnescape(m.group(2))
      stage.params.find(_.name == name).foreach {
        case p: IntParam => stage.set(p, raw.toInt)
        case p: LongParam => stage.set(p, raw.toLong)
        case p: DoubleParam => stage.set(p, raw.toDouble)
        case p: BooleanParam => stage.set(p, raw.toBoolean)
        case p: StringArrayParam =>
          stage.set(p, raw.stripPrefix(ArrayPrefix)
            .split('\u001f').filter(_.nonEmpty))
        case p: Param[_] =>
          stage.set(p.asInstanceOf[Param[Any]], raw)
      }
    }
}
