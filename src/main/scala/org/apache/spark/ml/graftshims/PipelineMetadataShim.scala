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
  private def esc(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  def save(stage: Params, path: String, spark: SparkSession): Unit = {
    // uid is caller-supplied (public (uid: String) constructors) — escape
    // it, or a quote in a uid writes malformed JSON that only explodes
    // later inside Pipeline.load
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
