package org.apache.spark.ml.graftshims

import org.apache.spark.ml.param.Params
import org.apache.spark.sql.SparkSession

/** Writes the standard `$path/metadata` file Spark's
  * Pipeline/PipelineModel.load uses to discover each stage's class
  * (DefaultParamsReader.loadParamsInstance) before dispatching to the
  * stage's own MLReadable — a custom writer that skips that file
  * produces stages that save fine standalone but cannot sit in a
  * persisted Pipeline.
  *
  * The JSON is hand-rolled rather than delegated to
  * DefaultParamsWriter.saveMetadata because that helper always
  * jsonEncodes the DEFAULT param map, and graft stages carry defaults
  * (functions, maps) with no JSON encoding. Both param maps are empty
  * on purpose: graft readers restore params from their own files.
  */
object PipelineMetadataShim {
  // uid is caller-supplied (public (uid: String) constructors) — full
  // JSON escaping (quotes, backslashes, control chars) or the metadata
  // only explodes later inside Pipeline.load; paired with
  // ModelIO.jsonUnescape on the read side
  private def esc(s: String): String = graft.core.ModelIO.jsonEscape(s)

  def save(stage: Params, path: String, spark: SparkSession): Unit = {
    val json =
      s"""{"class":"${esc(stage.getClass.getName)}",""" +
        s""""timestamp":${System.currentTimeMillis()},""" +
        s""""sparkVersion":"${spark.version}",""" +
        s""""uid":"${esc(stage.uid)}",""" +
        """"paramMap":{},"defaultParamMap":{}}"""
    graft.core.ModelIO.writeText(spark, s"$path/metadata/part-00000", json)
    graft.core.ModelIO.writeText(spark, s"$path/metadata/_SUCCESS", "")
  }
}
