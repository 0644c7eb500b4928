package graft.core

import org.apache.spark.ml.param.Params
import org.apache.spark.ml.util.{MLReadable, MLReader, MLWritable, MLWriter}

/** ComplexParamsWritable analogue (ref: core/src/main/scala/org/apache/
  * spark/ml/Serializer.scala:1-147): persistence for stages whose params
  * are not all expressible in DefaultParamsWriter's JSON encoding.
  *
  * Simple params (string/int/long/double/boolean/string-array) go to
  * `params.json` via [[ModelIO.paramsJson]]; every other explicitly-set
  * param value is Java-serialized into `complex.bin`. Anything a stage
  * holds in a param is already required to be Serializable by Spark's
  * task shipping (closures, UDFs, nested transformers, DataTypes), so
  * Java serialization is exactly as portable as running the stage.
  */
trait GraftWritable extends MLWritable { self: Params =>
  override def write: MLWriter = new GraftWriter(this)
}

private[graft] object ComplexIO {
  def isSimple(v: Any): Boolean = v match {
    case _: String | _: Int | _: Long | _: Double | _: Boolean => true
    case _: Array[String] => true
    case _ => false
  }
}

private[graft] class GraftWriter(stage: Params) extends MLWriter {
  override protected def saveImpl(path: String): Unit = {
    // ONE metadata format: the standard Spark file (class + uid + empty
    // param maps), which both Pipeline.load and GraftReader read
    org.apache.spark.ml.graftshims.PipelineMetadataShim
      .save(stage, path, sparkSession)
    ModelIO.writeText(sparkSession, s"$path/params.json",
      ModelIO.paramsJson(stage))
    val complex: Map[String, Any] = stage.params.toSeq.flatMap { p =>
      stage.get(p) match {
        case Some(v) if !ComplexIO.isSimple(v) => Seq(p.name -> v)
        case _ => Seq.empty
      }
    }.toMap
    if (complex.nonEmpty)
      ModelIO.writeObject(sparkSession, s"$path/complex.bin", complex)
  }
}

private[graft] class GraftReader[T <: Params] extends MLReader[T] {
  override def load(path: String): T = {
    // the shim writes metadata/part-00000; Spark's own writers use
    // part-00000-<uuid>.txt — accept any part file so artifacts from
    // either writer load, and fail with a diagnosable message otherwise
    val metaDir = new org.apache.hadoop.fs.Path(s"$path/metadata")
    val fs = metaDir.getFileSystem(sc.hadoopConfiguration)
    val partFile =
      if (fs.exists(metaDir))
        fs.listStatus(metaDir).map(_.getPath)
          .find(_.getName.startsWith("part-"))
      else None
    val metaPath = partFile.getOrElse(sys.error(
      s"no stage metadata under $metaDir — not a graft-saved stage " +
        "directory (or saved by a pre-metadata-unification version)"))
    val meta = ModelIO.readText(sparkSession, metaPath.toString)
    val Field = """"(class|uid)":"((?:[^"\\]|\\.)*)"""".r
    val fields = Field.findAllMatchIn(meta)
      .map(m => m.group(1) -> ModelIO.jsonUnescape(m.group(2))).toMap
    val (clsName, uid) = (fields.get("class"), fields.get("uid")) match {
      case (Some(c), Some(u)) => (c, u)
      case _ => sys.error(s"unreadable stage metadata: $meta")
    }
    val stage = Class.forName(clsName).getConstructor(classOf[String])
      .newInstance(uid).asInstanceOf[T]
    ModelIO.setParamsFromJson(stage,
      ModelIO.readText(sparkSession, s"$path/params.json"))
    val cp = new org.apache.hadoop.fs.Path(s"$path/complex.bin")
    if (fs.exists(cp)) {
      val complex = ModelIO.readObject[Map[String, Any]](
        sparkSession, s"$path/complex.bin")
      complex.foreach { case (n, v) =>
        stage.set(stage.getParam(n).asInstanceOf[
          org.apache.spark.ml.param.Param[Any]], v)
      }
    }
    stage
  }
}

/** Companion-object mixin: `object Foo extends GraftReadable[Foo]`. */
trait GraftReadable[T <: Params] extends MLReadable[T] {
  override def read: MLReader[T] = new GraftReader[T]
}
