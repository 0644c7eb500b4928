package graft.core

import org.apache.hadoop.fs.{FileSystem, FileUtil, Path}
import org.apache.spark.ml.PipelineStage
import org.apache.spark.ml.util.{MLReadable, MLWritable}
import org.apache.spark.sql.SparkSession

/** FS-backed named-model repository (ref: deep-learning/src/main/scala/
  * com/microsoft/ml/spark/downloader/ModelDownloader.scala:26-263 —
  * `Repository[Schema]` / `HDFSRepo` / `ModelDownloader`): publish, list,
  * inspect, load, and transfer named models with JSON metadata, on any
  * Hadoop-compatible filesystem (local, HDFS, object stores).
  *
  * Spark-first re-expression: the payload format is the stage's own
  * MLWritable directory (so anything the library can persist can be
  * published, fitted models included) and loading dispatches through the
  * model class's MLReadable companion — no parallel serialization
  * format. `copyTo` between two repos is the reference's
  * `downloadModel` contract (remote→local transfer with a size check);
  * the CDN-backed remote repository itself is out of scope offline.
  *
  * Layout: `root/<name>/model/` (MLWritable dir) + `root/<name>/info.json`.
  */
class ModelRepo(spark: SparkSession, root: String) {

  private val rootPath = new Path(root)
  private def fs: FileSystem =
    rootPath.getFileSystem(spark.sparkContext.hadoopConfiguration)

  case class ModelInfo(name: String, className: String, uid: String,
                       sizeBytes: Long, timestampMs: Long)

  /** Every name-taking operation resolves `root/<name>` — a traversal name
    * ('..') would address (or `delete` recursively destroy) paths OUTSIDE
    * the repo root, so validate centrally, not just on publish. Leading
    * '.' is rejected wholesale: it covers '.'/'..' and the reserved
    * `.tmp-`/`.old-` staging namespaces (a model named '.tmp-x-1' would
    * publish fine but be invisible to list() and live where publish
    * cleanup deletes). */
  private def checkName(name: String): String = {
    require(name.nonEmpty && !name.startsWith(".") &&
      !name.contains("/") && !name.contains("\\"),
      s"bad model name: '$name' (must be non-empty, not start with '.', " +
        "and contain no '/' or '\\')")
    name
  }

  private def infoPath(name: String) =
    new Path(rootPath, s"${checkName(name)}/info.json")
  private def modelPath(name: String) =
    new Path(rootPath, s"${checkName(name)}/model")

  /** Publish is atomic for READERS: stage dir + info.json are staged in a
    * temp sibling, the live dir (if any) is renamed ASIDE — never deleted
    * first, so the name has no absent window — the temp dir is renamed
    * into place, and only then is the old model deleted. A failed swap
    * restores the old model. Writers are NOT coordinated: publishing the
    * same name from two processes concurrently is undefined (single
    * writer per name is the caller's contract); the nested-directory
    * check below at least detects the HDFS-rename-into-existing-dir
    * outcome of such a race and fails instead of leaving `.tmp-*` debris
    * inside the live model. */
  def publish(name: String, stage: PipelineStage with MLWritable): ModelInfo = {
    checkName(name)
    val finalDir = new Path(rootPath, name)
    val stamp = System.nanoTime()
    val tmpDir = new Path(rootPath, s".tmp-$name-$stamp")
    stage.write.overwrite().save(new Path(tmpDir, "model").toString)
    val size = fs.getContentSummary(new Path(tmpDir, "model")).getLength
    val info = ModelInfo(name, stage.getClass.getName, stage.uid,
      size, System.currentTimeMillis())
    ModelIO.writeText(spark, new Path(tmpDir, "info.json").toString, infoJson(info))
    val oldDir = new Path(rootPath, s".old-$name-$stamp")
    val hadOld = fs.exists(finalDir)
    if (hadOld && !fs.rename(finalDir, oldDir)) {
      fs.delete(tmpDir, true)
      sys.error(s"publish of $name failed: could not move the live model aside")
    }
    // HDFS renames a source INTO an existing destination directory and
    // returns true — so a racing publisher can recreate finalDir between
    // our two renames and this rename would nest tmpDir inside it. Treat
    // rename-returned-false OR a nested result as failure.
    val renamed = fs.rename(tmpDir, finalDir)
    val nested = new Path(finalDir, tmpDir.getName)
    if (!renamed || fs.exists(nested)) {
      if (fs.exists(nested)) fs.delete(nested, true) else fs.delete(tmpDir, true)
      if (hadOld) fs.rename(oldDir, finalDir)
      sys.error(s"publish of $name failed: could not rename $tmpDir to " +
        s"$finalDir (concurrent publish?)")
    }
    if (hadOld) fs.delete(oldDir, true)
    info
  }

  def list(): Seq[ModelInfo] =
    if (!fs.exists(rootPath)) Seq.empty
    else fs.listStatus(rootPath).toSeq.filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_.startsWith("."))
      .filter(n => fs.exists(infoPath(n)))
      .map(info).sortBy(_.name)

  def info(name: String): ModelInfo = {
    require(fs.exists(infoPath(name)), s"no model named $name under $root")
    parseInfo(ModelIO.readText(spark, infoPath(name).toString))
  }

  /** Load by name, dispatching to the model class's MLReadable companion
    * (same reflection Pipeline.load uses). */
  def load(name: String): PipelineStage = {
    val i = info(name)
    val companion = Class.forName(i.className + "$")
    companion.getField("MODULE$").get(null) match {
      case r: MLReadable[_] =>
        r.load(modelPath(name).toString).asInstanceOf[PipelineStage]
      case _ => sys.error(s"${i.className} has no MLReadable companion")
    }
  }

  /** Transfer a model to another repo — the reference's downloadModel
    * shape (remote repo → local repo), with a size integrity check. */
  def copyTo(other: ModelRepo, name: String): ModelInfo = {
    val i = info(name)
    val src = modelPath(name)
    val dst = other.modelPath(name)
    val dstFs = other.fs
    if (dstFs.exists(dst)) dstFs.delete(dst, true)
    FileUtil.copy(fs, src, dstFs, dst, false, true,
      spark.sparkContext.hadoopConfiguration)
    val copied = dstFs.getContentSummary(dst).getLength
    require(copied == i.sizeBytes,
      s"copy of $name incomplete: $copied of ${i.sizeBytes} bytes")
    ModelIO.writeText(spark, other.infoPath(name).toString, infoJson(i))
    i
  }

  def delete(name: String): Unit =
    fs.delete(new Path(rootPath, checkName(name)), true)

  private def infoJson(i: ModelInfo): String = {
    def e(s: String) = ModelIO.jsonEscape(s)
    s"""{"name":"${e(i.name)}","class":"${e(i.className)}",""" +
      s""""uid":"${e(i.uid)}","sizeBytes":${i.sizeBytes},""" +
      s""""timestampMs":${i.timestampMs}}"""
  }

  private def parseInfo(json: String): ModelInfo = {
    val Str = """"(name|class|uid)":"((?:[^"\\]|\\.)*)"""".r
    val Num = """"(sizeBytes|timestampMs)":(\d+)""".r
    val strs = Str.findAllMatchIn(json)
      .map(m => m.group(1) -> ModelIO.jsonUnescape(m.group(2))).toMap
    val nums = Num.findAllMatchIn(json)
      .map(m => m.group(1) -> m.group(2).toLong).toMap
    ModelInfo(strs("name"), strs("class"), strs("uid"),
      nums("sizeBytes"), nums("timestampMs"))
  }
}
