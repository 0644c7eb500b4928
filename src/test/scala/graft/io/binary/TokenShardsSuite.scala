package graft.io.binary

import graft.TestBase
import org.apache.spark.sql.functions._

class TokenShardsSuite extends TestBase {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).toString

  test("width-4 roundtrip across shard rolls, empty docs included") {
    val docs = Seq(
      Seq(1, 2, 3, 70000, Int.MaxValue),
      Seq.empty[Int],
      (0 until 5000).toSeq,
      Seq(42)).toDF("tokens")
    val dir = tmp("tok4")
    TokenShards.write(docs, dir, maxShardBytes = 4096)
    val back = TokenShards.read(spark, dir)
    assert(back.count() == 4)
    assertDFEq(back.select("tokens"), docs)
    val names = new java.io.File(dir).listFiles().map(_.getName)
      .filterNot(_.startsWith("."))
    assert(names.count(_.endsWith(".bin")) > 1, "cap must roll shards")
    assert(names.count(_.endsWith(".bin")) == names.count(_.endsWith(".idx")))
  }

  test("a document spanning multiple read chunks decodes exactly") {
    // ReadChunkIds * 2 + 17 ids forces three readFully chunks for one
    // doc (the bounded-chunk path that replaced the doc-sized buffer,
    // which overflowed Int arithmetic past ~536M tokens — round 14);
    // a trailing small doc pins the chunk-boundary bookkeeping between
    // documents in the same shard
    val n = TokenShards.ReadChunkIds * 2 + 17
    val bigDoc = Array.tabulate(n)(i => (i * 2654435761L).toInt & 0x7fffffff)
    val docs = Seq(bigDoc.toSeq, Seq(7, 8, 9)).toDF("tokens")
    val dir = tmp("tokbig")
    TokenShards.write(docs, dir)
    val back = TokenShards.read(spark, dir).orderBy("ordinal")
      .select("tokens").as[Seq[Int]].collect()
    assert(back.length == 2)
    assert(back(0).length == n)
    assert(java.util.Arrays.equals(back(0).toArray, bigDoc))
    assert(back(1) == Seq(7, 8, 9))
  }

  test("width-2 packs two bytes per id and rejects overflow") {
    val dir = tmp("tok2")
    TokenShards.write(Seq(Seq(0, 1, 65535)).toDF("tokens"), dir, width = 2)
    assertDFEq(TokenShards.read(spark, dir).select("tokens"),
      Seq(Seq(0, 1, 65535)).toDF("tokens"))
    val bin = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    assert(bin.length() == 6, s"3 uint16 ids must be 6 bytes, got ${bin.length}")
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.write(Seq(Seq(65536)).toDF("tokens"), tmp("tokof"),
        width = 2)
    }
    assert(e.getMessage.contains("uint16") ||
      (e.getCause != null && e.getCause.getMessage.contains("uint16")))
  }

  test("truncated .bin fails loudly instead of decoding garbage ids") {
    // the format has no commit protocol: a killed writer leaves a short
    // .bin whose old per-byte read() masked EOF as 0xff token bytes
    val dir = tmp("toktrunc")
    TokenShards.write(Seq(Seq(1, 2, 3, 4, 5)).toDF("tokens"), dir)
    val bin = new java.io.File(dir).listFiles()
      .filter(_.getName.endsWith(".bin")).head
    val ch = java.nio.file.Files.newByteChannel(bin.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    ch.truncate(bin.length() - 3); ch.close()
    val e = intercept[org.apache.spark.SparkException] {
      TokenShards.read(spark, dir).count()
    }
    val msg = e.getMessage +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("truncated") || msg.contains("length"))
  }

  test("ordinals preserve in-shard order: shard order IS training order") {
    val docs = (0 until 100).map(i => Seq(i)).toDF("tokens")
      .coalesce(1) // one partition -> one deterministic shard sequence
    val dir = tmp("tokord")
    TokenShards.write(docs, dir, maxShardBytes = 1L << 20)
    val back = TokenShards.read(spark, dir)
      .orderBy("shard", "ordinal")
      .select(element_at(col("tokens"), 1)).as[Int].collect()
    assert(back.toSeq == (0 until 100))
  }
}
