package graft.io.binary

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.io.{BufferedInputStream, DataInputStream, DataOutputStream}

/** Fixed-width token-id shard export/import — the Megatron/GPT-NeoX
  * `.bin`+`.idx` convention: a training job memory-maps flat token-id
  * arrays and slices windows by offset, so the exported corpus must be
  * raw fixed-width ids with a tiny per-document length index, not a
  * row format. The natural tail of the curation recipe: BPE/unigram
  * encode → [[graft.text.ConcatChunker]]/[[graft.text.SequencePacker]]
  * → [[graft.text.CorpusShuffler]] → token shards.
  *
  * Layout per shard pair:
  *  - `part-<pid>-<seq>.bin` — every document's ids concatenated,
  *    little-endian, `width` bytes each (2 covers vocabs to 65535 —
  *    the GPT-2/50k case; 4 for anything larger);
  *  - `part-<pid>-<seq>.idx` — magic `GRFTIDX1`, the width byte, a
  *    doc count, then one int32 length per document.
  *
  * write streams both files executor-side through the Hadoop FS API
  * (same collision-free naming, overwrite, and no-speculation caveat
  * as [[TarShards.write]]); the byte cap bounds the `.bin` payload.
  * Memory is O(docs-per-shard) int32 lengths; token bytes stream.
  *
  * read lists shard pairs driver-side and streams one pair per task —
  * peak memory one document's ids. Documents come back in shard order
  * with their in-shard ordinal, so a deterministic input partitioning
  * (CorpusShuffler) reproduces the training order exactly.
  */
object TokenShards {

  val entryType: StructType = StructType(Seq(
    StructField("shard", StringType),
    StructField("ordinal", LongType),
    StructField("tokens", ArrayType(IntegerType))))

  private val Magic = "GRFTIDX1".getBytes("US-ASCII")

  /** reader chunk size in ids (visible to the suite so multi-chunk
    * decode is exercised without a quarter-million-token fixture) */
  private[binary] val ReadChunkIds = 1 << 18

  /** Write `tokensCol` (array<int>) rows as shard pairs under `outDir`. */
  def write(df: DataFrame, outDir: String, tokensCol: String = "tokens",
            width: Int = 4, maxShardBytes: Long = 1L << 30,
            overwrite: Boolean = true): Unit = {
    require(width == 2 || width == 4, s"width=$width must be 2 or 4")
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
    val w = width
    df.select(col(tokensCol)).foreachPartition { (it: Iterator[Row]) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val basePath = new org.apache.hadoop.fs.Path(out)
      val fs = basePath.getFileSystem(conf.value)
      var seq = 0
      var written = 0L
      var bin: DataOutputStream = null
      var lengths: scala.collection.mutable.ArrayBuffer[Int] = null
      def closeShard(): Unit = if (bin != null) {
        bin.close()
        val p = new org.apache.hadoop.fs.Path(basePath,
          f"part-$pid%05d-${seq - 1}%05d.idx")
        val idx = new DataOutputStream(fs.create(p, true))
        idx.write(Magic)
        idx.writeByte(w)
        idx.writeLong(lengths.length.toLong)
        lengths.foreach(idx.writeInt)
        idx.close()
        bin = null
      }
      def roll(): Unit = {
        closeShard()
        val p = new org.apache.hadoop.fs.Path(basePath,
          f"part-$pid%05d-$seq%05d.bin")
        bin = new DataOutputStream(new java.io.BufferedOutputStream(
          fs.create(p, true), 1 << 16))
        lengths = scala.collection.mutable.ArrayBuffer.empty[Int]
        seq += 1
        written = 0L
      }
      // bulk writes in bounded chunks (per-id writeByte calls cost
      // 2-4 stream dispatches per token on the hot path; one doc-sized
      // array would overflow Array[Byte] for a pathological >2 GiB
      // document where the old streaming path kept working — round-13
      // review). ONE buffer per partition: per-doc allocation would be
      // a zero-fill per document on the hot path.
      val chunkIds = 1 << 18
      val buf = new Array[Byte](chunkIds * w)
      it.foreach { r =>
        val ids = r.getSeq[Int](0)
        require(ids != null, "null token array (filter upstream)")
        val bytes = ids.length.toLong * w
        if (bin == null || (written > 0 && written + bytes > maxShardBytes))
          roll()
        var bi = 0
        ids.foreach { id =>
          if (w == 2) {
            require(id >= 0 && id <= 0xffff,
              s"token id $id out of uint16 range (use width=4)")
            buf(bi) = (id & 0xff).toByte
            buf(bi + 1) = ((id >> 8) & 0xff).toByte
            bi += 2
          } else {
            buf(bi) = (id & 0xff).toByte
            buf(bi + 1) = ((id >> 8) & 0xff).toByte
            buf(bi + 2) = ((id >> 16) & 0xff).toByte
            buf(bi + 3) = ((id >> 24) & 0xff).toByte
            bi += 4
          }
          if (bi == buf.length) { bin.write(buf, 0, bi); bi = 0 }
        }
        if (bi > 0) bin.write(buf, 0, bi)
        lengths += ids.length
        written += bytes
      }
      closeShard()
    }
  }

  /** Shard documents as (shard, ordinal, tokens) — one task per pair. */
  def read(spark: SparkSession, dir: String): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val base = new org.apache.hadoop.fs.Path(dir)
    val fs = base.getFileSystem(conf.value)
    val shards = fs.globStatus(new org.apache.hadoop.fs.Path(base, "*.bin"))
      .map(_.getPath.toString).sorted.toSeq
    val rdd = spark.sparkContext
      .parallelize(shards, math.max(1, shards.length))
      .flatMap { p =>
        val binPath = new org.apache.hadoop.fs.Path(p)
        val idxPath = new org.apache.hadoop.fs.Path(
          p.stripSuffix(".bin") + ".idx")
        val fsl = binPath.getFileSystem(conf.value)
        val idx = new DataInputStream(
          new BufferedInputStream(fsl.open(idxPath)))
        val magic = new Array[Byte](8)
        idx.readFully(magic)
        require(java.util.Arrays.equals(magic, Magic),
          s"$idxPath: bad magic")
        val w = idx.readByte().toInt
        require(w == 2 || w == 4, s"$idxPath: bad width $w")
        val n = idx.readLong()
        val lengths = Array.fill(n.toInt)(idx.readInt())
        idx.close()
        // fail-loud on truncation up front: the format has no commit
        // protocol, so a killed writer leaves a short .bin — the old
        // per-byte read() masked its EOF as 0xff and decoded garbage ids
        val expect = lengths.foldLeft(0L)(_ + _.toLong) * w
        val actual = fsl.getFileStatus(binPath).getLen
        require(actual == expect,
          s"$p: .bin length $actual != $expect implied by the .idx " +
            "(truncated or mismatched shard pair)")
        val bin = new DataInputStream(
          new BufferedInputStream(fsl.open(binPath), 1 << 16))
        Option(org.apache.spark.TaskContext.get()).foreach(
          _.addTaskCompletionListener[Unit](_ => bin.close()))
        // bulk readFully in bounded chunks + local decode (readFully
        // throws EOFException instead of masking -1; 4 single-byte
        // read() calls per id dominated the hot read path). The chunk
        // mirrors the writer's 1<<18-id buffer: one doc-sized byte
        // array would overflow Int arithmetic for a >536M-token
        // document at width 4 — exactly the >2 GiB document the
        // writer's chunked path was changed to keep supporting
        // (round-14 ADVICE). ONE buffer per shard, not per doc.
        val chunk = new Array[Byte](ReadChunkIds * w)
        lengths.iterator.zipWithIndex.map { case (len, ord) =>
          val ids = new Array[Int](len)
          var done = 0
          while (done < len) {
            val m = math.min(ReadChunkIds, len - done)
            bin.readFully(chunk, 0, m * w)
            var i = 0
            while (i < m) {
              val b = i * w
              ids(done + i) =
                if (w == 2) (chunk(b) & 0xff) | ((chunk(b + 1) & 0xff) << 8)
                else (chunk(b) & 0xff) | ((chunk(b + 1) & 0xff) << 8) |
                  ((chunk(b + 2) & 0xff) << 16) | ((chunk(b + 3) & 0xff) << 24)
              i += 1
            }
            done += m
          }
          Row(p, ord.toLong, ids.toSeq)
        }
      }
    spark.createDataFrame(rdd, entryType)
  }
}
