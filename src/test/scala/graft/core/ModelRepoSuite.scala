package graft.core

import graft.TestBase
import org.apache.spark.sql.functions._

/** ModelRepo: publish/list/info/load/copyTo/delete over the local Hadoop
  * FS, with both a params-only stage and a stateful fitted model as
  * payloads (ref behavior: downloader/DownloaderSuite.scala — list
  * schemas, download with integrity check, load and use).
  */
class ModelRepoSuite extends TestBase {
  import spark.implicits._

  private def tmpRepo(tag: String) = new ModelRepo(spark,
    java.nio.file.Files.createTempDirectory(s"graft-repo-$tag").toString)

  test("publish, list, load, and use a params-only stage") {
    val repo = tmpRepo("a")
    val stage = new graft.text.TextPreprocessor().setInputCol("t")
      .setOutputCol("o").setMap(Map("cat" -> "dog"))
    val info = repo.publish("pre", stage)
    assert(info.className == stage.getClass.getName && info.sizeBytes > 0)
    assert(repo.list().map(_.name) == Seq("pre"))
    val loaded = repo.load("pre")
      .asInstanceOf[graft.text.TextPreprocessor]
    val out = loaded.transform(Seq("a cat").toDF("t"))
      .select("o").as[String].collect()
    assert(out.sameElements(Array("a dog")))
  }

  test("publish and reload a stateful fitted model") {
    val repo = tmpRepo("b")
    val df = (0 until 40)
      .map(i => (i.toLong, Array(i.toDouble, (i * 5 % 11).toDouble)))
      .toDF("id", "emb")
    val m = new graft.nn.KNN().setInputCol("emb").setIdCol("id")
      .setK(2).fit(df)
    repo.publish("knn", m)
    val loaded = repo.load("knn").asInstanceOf[graft.nn.KNNModel]
    assertDFEq(
      m.transform(df).select(col("id"), col("matches.id").as("n")),
      loaded.transform(df).select(col("id"), col("matches.id").as("n")))
  }

  test("copyTo transfers between repos with an integrity check; delete removes") {
    val src = tmpRepo("c1"); val dst = tmpRepo("c2")
    src.publish("sel",
      new graft.stages.SelectColumns().setCols(Seq("x")))
    src.copyTo(dst, "sel")
    assert(dst.list().map(_.name) == Seq("sel"))
    assert(dst.info("sel").sizeBytes == src.info("sel").sizeBytes)
    dst.load("sel") // loads from the copied payload
    src.delete("sel")
    assert(src.list().isEmpty && dst.list().nonEmpty)
  }

  test("unknown model name fails with a clear error") {
    val repo = tmpRepo("d")
    val e = intercept[RuntimeException](repo.info("nope"))
    assert(e.getMessage.contains("no model named"))
  }

  test("traversal and malformed names are rejected on EVERY operation") {
    val repo = tmpRepo("e")
    val stage = new graft.stages.SelectColumns().setCols(Seq("x"))
    for (bad <- Seq("..", ".", "", "a/b", "a\\b", "../escape")) {
      intercept[IllegalArgumentException](repo.publish(bad, stage))
      intercept[IllegalArgumentException](repo.info(bad))
      intercept[IllegalArgumentException](repo.load(bad))
      intercept[IllegalArgumentException](repo.delete(bad))
      intercept[IllegalArgumentException](repo.copyTo(tmpRepo("e2"), bad))
    }
  }

  test("publish is atomic: no half-written model visible, overwrite survives") {
    val root = java.nio.file.Files.createTempDirectory("graft-repo-f")
    val repo = new ModelRepo(spark, root.toString)
    val stage = new graft.text.TextPreprocessor().setInputCol("t")
      .setOutputCol("o").setMap(Map("cat" -> "dog"))
    repo.publish("m", stage)
    // republish over an existing name: reader sees old-or-new, never partial
    val info2 = repo.publish("m",
      new graft.text.TextPreprocessor().setInputCol("t").setOutputCol("o")
        .setMap(Map("cat" -> "fox")))
    assert(repo.list().map(_.name) == Seq("m"))
    assert(repo.info("m").uid == info2.uid)
    // no .tmp- debris left behind, and list() would hide it anyway
    val leftovers = java.nio.file.Files.list(root).iterator()
    var names = List.empty[String]
    while (leftovers.hasNext) names ::= leftovers.next().getFileName.toString
    assert(names == List("m"), s"unexpected repo-root entries: $names")
  }
}
