package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: the UT1 blocklist-TABLE path at NAMEPLATE scale — the
  * `url_filter_table` gate proves semantics on a 3-entry fixture; this
  * probe proves the driver-collect + CompactStringSet-broadcast +
  * suffix-chain-probe shape at the real UT1 size (the public UT1
  * "adult" category alone is ~3.7M entries).
  *
  * Blocklist synthesis (multi-million, three entry classes):
  *  - 20% full hostnames all on ONE hot registered domain
  *    (`uN.blogspot.com` — the class where any per-bucket scan went
  *    quadratic, round 13);
  *  - 20% registered domains under a multi-label public suffix
  *    (`regN.co.uk` — exercises the three-label tail);
  *  - 60% plain registered domains (`domN.com`).
  *
  * Fact side: one URL per documents row, 3 of every 10 rows hitting a
  * different blocklist class (hot-domain exact + subdomain, plain
  * registered domain, co.uk registered domain), the rest clean — so
  * the probe pays the full suffix-chain on misses too.
  *
  * Prints ONE JSON line: entries, packed MB, collect+pack wall (the
  * driver cost the round-13 verdict flagged as unmeasured), filter
  * wall, the SECOND-use filter wall off the pre-packed handle plus
  * save/load walls (round 15: the amortization path — N jobs pay the
  * pack once), rows and kept counts.
  *
  * Usage: graft.tools.Ut1Probe <sfDir> [entries=3500000]
  */
object Ut1Probe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val entries = if (args.length > 1) args(1).toInt else 3500000
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"))
    docs.count() // untimed warmup read

    val id = col("id")
    val idDiv5 = (id / 5).cast("long").cast("string") // SQL / is DOUBLE
    val blocklist = spark.range(entries.toLong).select(
      when(id % 5 === 0,
        concat(lit("u"), idDiv5, lit(".blogspot.com")))
      .when(id % 5 === 1,
        concat(lit("reg"), idDiv5, lit(".co.uk")))
      .otherwise(concat(lit("dom"), id.cast("string"), lit(".com")))
      .as("domain"))

    val d = col("doc_id")
    val urls = docs.select(d, concat(lit("https://"),
      when(d % 10 === 0,                       // hot-domain exact entry hit
        concat(lit("u"), (d % 1000).cast("string"), lit(".blogspot.com")))
      .when(d % 10 === 1,                      // subdomain of a hot entry
        concat(lit("a.u"), (d % 1000).cast("string"), lit(".blogspot.com")))
      .when(d % 10 === 2,                      // plain registered domain
        concat(lit("x.dom"), (d % 100000).cast("string"), lit(".com")))
      .when(d % 10 === 3,                      // co.uk registered domain
        concat(lit("sub.reg"), (d % 1000).cast("string"), lit(".co.uk")))
      .when(d % 10 === 4,                      // same hot rd, NOT listed
        concat(lit("keep"), d.cast("string"), lit("x.blogspot.com")))
      .otherwise(                              // clean host, full-chain miss
        concat(lit("ok"), d.cast("string"), lit(".example.org"))),
      lit("/p/"), d.cast("string")).as("url"))

    // phase 1: the driver collect + pack (what filterByDomainTable does
    // eagerly at plan-build), measured alone for the SCALING.md row
    val t0 = System.nanoTime()
    val collected = blocklist
      .select(regexp_replace(regexp_replace(lower(col("domain")),
        "\\s", ""), "^www\\.", "").as("e"))
      .filter(col("e") =!= "").distinct().collect().map(_.getString(0))
    val cset = graft.core.CompactStringSet(collected.toSeq)
    val t1 = System.nanoTime()

    // phase 2: the operator end-to-end (its own collect+pack+filter)
    val rows = urls.count()
    val t2 = System.nanoTime()
    val kept = graft.text.UrlFilter
      .filterByDomainTable(urls, "url", blocklist)
      .count()
    val t3 = System.nanoTime()

    // phase 3 (round 15): SECOND use — the pre-packed handle skips the
    // per-call distinct+collect+pack, so a crawl pipeline of N jobs
    // pays phase 1 once; this wall is the amortized steady state
    val kept2 = graft.text.UrlFilter
      .filterByDomainSet(urls, "url", cset)
      .count()
    val t4 = System.nanoTime()

    // phase 4 (round 15): cross-JOB amortization — save/load of the
    // packed structure (three flat arrays, straight channel I/O)
    val packPath = java.nio.file.Files
      .createTempDirectory("ut1probe").resolve("ut1.gcss").toString
    cset.save(packPath)
    val t5 = System.nanoTime()
    val loaded = graft.core.CompactStringSet.load(packPath)
    val t6 = System.nanoTime()
    require(loaded.size == cset.size && kept2 == kept,
      s"round-trip mismatch: size ${loaded.size}/${cset.size} " +
        s"kept $kept2/$kept")
    java.nio.file.Files.delete(java.nio.file.Paths.get(packPath))

    if (sys.env.contains("UT1_DEBUG")) {
      graft.text.UrlFilter.filterByDomainTable(
        urls.withColumn("cls", d % 10), "url", blocklist)
        .groupBy("cls").count().orderBy("cls").show(20, false)
      println("entry samples present: " +
        Seq("u5.blogspot.com", "dom77.com", "reg1.co.uk")
          .map(e => s"$e=${cset.contains(e)}").mkString(" "))
    }
    println(f"""{"probe":"ut1","entries":${cset.size},""" +
      f""""packedMB":${cset.packedBytes / 1048576.0}%.1f,""" +
      f""""collectPackSec":${(t1 - t0) / 1e9}%.2f,""" +
      f""""filterSec":${(t3 - t2) / 1e9}%.2f,""" +
      f""""prepackedFilterSec":${(t4 - t3) / 1e9}%.2f,""" +
      f""""saveSec":${(t5 - t4) / 1e9}%.2f,""" +
      f""""loadSec":${(t6 - t5) / 1e9}%.2f,""" +
      f""""rows":$rows,"kept":$kept}""")
    spark.stop()
  }
}
