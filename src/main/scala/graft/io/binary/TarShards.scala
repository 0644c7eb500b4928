package graft.io.binary

import org.apache.commons.compress.archivers.tar.{TarArchiveEntry, TarArchiveInputStream, TarArchiveOutputStream}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.BufferedInputStream

/** WebDataset-style tar shard export/import (the public convention for
  * multimodal training data: samples as consecutive tar entries, the
  * SHARD as the unit of parallelism — a trainer's data loader streams
  * whole shards sequentially, which is why the format beats
  * one-file-per-sample at 100 TB: sequential I/O, bounded file counts,
  * trivially shufflable at the shard level).
  *
  * write: each partition streams its rows into byte-capped `.tar`
  * shards through the Hadoop FS API executor-side — no driver collect,
  * any DFS. The cap counts the FRAMED size (512 B header per entry +
  * 512-byte payload padding + the 1 KiB end-of-archive marker), so a
  * shard's on-disk size stays at-or-under `maxShardBytes` even for
  * many-small-entry workloads where the framing dominates. Shards are
  * named `part-<partition>-<seq>.tar`, so concurrent tasks never
  * collide and a retried task overwrites its own files — but the
  * foreachPartition write has NO commit protocol, so speculative
  * execution must be OFF (`spark.speculation=false`, the default): two
  * live attempts of one task would race on the same shard paths.
  * Output is deterministic for a deterministic input partitioning (pair
  * with [[graft.text.CorpusShuffler]] for the training-order contract).
  *
  * read: shard files are listed driver-side (O(shards) state) and each
  * task STREAMS its shard through a commons-compress entry walk — one
  * task per shard, the format's intended parallelism, with peak memory
  * of ONE ENTRY's bytes (not the shard: an earlier draft scanned whole
  * shards through `binaryFile`, which materializes each shard twice and
  * hard-fails past 2 GiB; the streaming walk has no shard-size limit).
  */
object TarShards {

  val entryType: StructType = StructType(Seq(
    StructField("shard", StringType),
    StructField("name", StringType),
    StructField("bytes", BinaryType)))

  /** Tar-framed size of one entry: 512 B header + payload rounded up to
    * the 512-byte block. */
  private def framedBytes(payload: Long): Long =
    512L + ((payload + 511L) / 512L) * 512L

  /** Write (name, bytes) rows as tar shards under `outDir`. With
    * `overwrite` the directory is deleted first — stale shards from a
    * previous run with a different partitioning would otherwise
    * resurface as duplicate samples at read time. */
  def write(df: DataFrame, outDir: String,
            nameCol: String = "path", bytesCol: String = "bytes",
            maxShardBytes: Long = 1L << 30,
            overwrite: Boolean = true): Unit = {
    require(maxShardBytes > 0, s"maxShardBytes=$maxShardBytes must be positive")
    val conf = new org.apache.spark.util.SerializableConfiguration(
      df.sparkSession.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(outDir)
    if (overwrite) {
      val fs = base.getFileSystem(conf.value)
      if (fs.exists(base)) fs.delete(base, true)
      fs.mkdirs(base)
    }
    val out = outDir
    df.select(col(nameCol).cast("string"), col(bytesCol))
      .foreachPartition { (it: Iterator[Row]) =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val basePath = new org.apache.hadoop.fs.Path(out)
        val fs = basePath.getFileSystem(conf.value)
        var seq = 0
        var written = 0L // framed bytes so far, excluding the EOF marker
        var tar: TarArchiveOutputStream = null
        def roll(): Unit = {
          if (tar != null) { tar.finish(); tar.close() }
          val p = new org.apache.hadoop.fs.Path(basePath,
            f"part-$pid%05d-$seq%05d.tar")
          tar = new TarArchiveOutputStream(fs.create(p, true))
          tar.setLongFileMode(TarArchiveOutputStream.LONGFILE_POSIX)
          seq += 1
          written = 0L
        }
        it.foreach { r =>
          val bytes = r.getAs[Array[Byte]](1)
          val framed = framedBytes(bytes.length.toLong)
          // +1024: the end-of-archive marker the current shard will pay
          // when it closes must also fit under the cap. A cap too small
          // for even one framed entry degrades to one entry per shard
          // (the written > 0 guard), never an empty shard or a drop.
          if (tar == null ||
              (written > 0 && written + framed + 1024 > maxShardBytes))
            roll()
          val e = new TarArchiveEntry(r.getString(0))
          e.setSize(bytes.length.toLong)
          tar.putArchiveEntry(e)
          tar.write(bytes)
          tar.closeArchiveEntry()
          written += framed
        }
        if (tar != null) { tar.finish(); tar.close() }
      }
  }

  /** Shard entries as (shard, name, bytes) rows — one input task per
    * shard file, entries streamed (peak memory: one entry). */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf.value)
    val shards = fs.globStatus(new org.apache.hadoop.fs.Path(base, "*.tar"))
      .map(_.getPath.toString).sorted.toSeq
    val rdd = spark.sparkContext
      .parallelize(shards, math.max(1, shards.length))
      .flatMap { p =>
        val path = new org.apache.hadoop.fs.Path(p)
        val tin = new TarArchiveInputStream(new BufferedInputStream(
          path.getFileSystem(conf.value).open(path)))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => tin.close()))
        new Iterator[Row] {
          private def advance(): TarArchiveEntry = {
            var e = tin.getNextEntry
            while (e != null && e.isDirectory) e = tin.getNextEntry
            e
          }
          private var entry = advance()
          override def hasNext: Boolean = entry != null
          override def next(): Row = {
            val e = entry
            // InputStream.readAllBytes is entry-bounded: the tar stream
            // EOFs at the current entry's end
            val bytes = tin.readAllBytes()
            entry = advance()
            Row(p, e.getName, bytes)
          }
        }
      }
    spark.createDataFrame(rdd, entryType)
  }
}
