package graft.streaming

import graft.TestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSuite extends TestBase {
  import spark.implicits._

  test("EventTimeWindowAggregator tumbles on batch frames") {
    val df = Seq(
      ("2024-01-01 00:10:00", 5.0), ("2024-01-01 00:40:00", 3.0),
      ("2024-01-01 01:10:00", 2.0)
    ).toDF("ts_s", "value").withColumn("ts", to_timestamp(col("ts_s")))
    val out = new EventTimeWindowAggregator().setTimeCol("ts")
      .setWindowDuration("1 hour").setValueCol("value")
      .transform(df).orderBy("window_start").collect()
    assert(out.length == 2)
    assert(out(0).getAs[Long]("n") == 2 && out(0).getAs[Double]("sum_value") == 8.0)
    assert(out(1).getAs[Long]("n") == 1 && out(1).getAs[Double]("sum_value") == 2.0)
  }

  test("EventTimeWindowAggregator with watermark on a stream") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, Double)]
    val agg = new EventTimeWindowAggregator().setTimeCol("ts")
      .setWindowDuration("10 minutes").setWatermark("5 minutes")
      .setValueCol("value")
      .transform(mem.toDF().toDF("ts", "value"))
    val q = agg.writeStream.format("memory").queryName("winagg")
      .outputMode("append").start()
    try {
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1.0),
        (java.sql.Timestamp.valueOf("2024-01-01 00:05:00"), 2.0))
      q.processAllAvailable()
      // advance watermark far past the first window so it closes
      mem.addData((java.sql.Timestamp.valueOf("2024-01-01 01:00:00"), 9.0))
      q.processAllAvailable()
      val rows = spark.table("winagg").collect()
      assert(rows.exists(r => r.getAs[Long]("n") == 2 &&
        r.getAs[Double]("sum_value") == 3.0))
    } finally q.stop()
  }

  test("StreamingDeduplicator drops duplicate docs within the watermark") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = new StreamingDeduplicator().setInputCol("text")
      .setTimeCol("ts").setWatermarkDelay("10 minutes")
      .transform(mem.toDF().toDF("ts", "text"))
    val q = dedup.writeStream.format("memory").queryName("streamdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "alpha doc"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "  Alpha   DOC "),
        (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), "beta doc"))
      q.processAllAvailable()
      mem.addData( // same canonical text again, still inside the watermark
        (java.sql.Timestamp.valueOf("2024-01-01 00:04:00"), "alpha doc"))
      q.processAllAvailable()
      val texts = spark.table("streamdedup").collect().map(_.getString(1))
      assert(texts.length == 2) // one alpha (canonically equal), one beta
      assert(texts.exists(_.contains("beta")))
    } finally q.stop()
  }

  test("StreamingDeduplicator filters the static corpus index first") {
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("known corpus doc", "another curated one")
      .toDF("text")
    val idx = StreamingDeduplicator.fingerprintIndex(corpus, "text")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = new StreamingDeduplicator().setInputCol("text")
      .setTimeCol("ts").setWatermarkDelay("10 minutes")
      .setCorpusIndex(idx)
      .transform(mem.toDF().toDF("ts", "text"))
    val q = dedup.writeStream.format("memory").queryName("streamincdedup")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "KNOWN corpus  doc"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "fresh doc"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:03:00"), "fresh  DOC"))
      q.processAllAvailable()
      val texts = spark.table("streamincdedup").collect().map(_.getString(1))
      // corpus copy filtered by the index; in-stream dup collapsed
      assert(texts.length == 1 && texts.head.toLowerCase.contains("fresh"))
    } finally q.stop()
  }

  test("batch-persisted incremental index drives the streaming dedup") {
    // the 128-bit (__fp, __fp2) index written by the BATCH incremental
    // path must be directly usable as the streaming static side — one
    // persisted index, both engines
    implicit val sqlCtx = spark.sqlContext
    val corpus = Seq("known corpus doc", "another curated one").toDF("text")
    val idx = graft.dedup.IncrementalDeduplicator.fingerprintIndex(corpus, "text")
    val mem = MemoryStream[(java.sql.Timestamp, String)]
    val dedup = new StreamingDeduplicator().setInputCol("text")
      .setTimeCol("ts").setWatermarkDelay("10 minutes")
      .setCorpusIndex(idx)
      .transform(mem.toDF().toDF("ts", "text"))
    val q = dedup.writeStream.format("memory").queryName("streambatchidx")
      .outputMode("append").start()
    try {
      mem.addData(
        (java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), "Another CURATED one"),
        (java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), "novel doc"))
      q.processAllAvailable()
      val texts = spark.table("streambatchidx").collect().map(_.getString(1))
      assert(texts.toSeq == Seq("novel doc"))
    } finally q.stop()
  }

  test("StreamingDeduplicator is a plain fingerprint dedup on batch") {
    val df = Seq(
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "x y"),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:01"), "X  y "),
      (java.sql.Timestamp.valueOf("2024-01-01 00:00:02"), "z")
    ).toDF("ts", "text")
    val out = new StreamingDeduplicator().setInputCol("text").transform(df)
    assert(out.count() == 2)
    assert(out.columns.toSeq == Seq("ts", "text"))
  }

  test("Sessionize assigns gap-based session ids on batch") {
    val df = Seq(
      (1L, "2024-01-01 00:00:00"), (1L, "2024-01-01 00:10:00"),
      (1L, "2024-01-01 02:00:00"), (2L, "2024-01-01 00:00:00")
    ).toDF("user_id", "ts_s").withColumn("ts", to_timestamp(col("ts_s")))
    val out = new Sessionize().setKeyCol("user_id").setTimeCol("ts")
      .setGapSeconds(1800).transform(df)
      .select("user_id", "ts_s", "session_id").collect()
      .map(r => (r.getLong(0), r.getString(1)) -> r.getInt(2)).toMap
    assert(out((1L, "2024-01-01 00:00:00")) == 0)
    assert(out((1L, "2024-01-01 00:10:00")) == 0)
    assert(out((1L, "2024-01-01 02:00:00")) == 1)
    assert(out((2L, "2024-01-01 00:00:00")) == 0)
  }

  test("SessionizeStream closes sessions across micro-batches") {
    implicit val s = spark
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Long)]
    val q = SessionizeStream(mem.toDS(), gapSeconds = 60, useTimeout = false)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try {
      mem.addData((1L, 1000L), (1L, 1030L))
      q.processAllAvailable()
      mem.addData((1L, 5000L)) // gap > 60s -> closes first session
      q.processAllAvailable()
      val rows = spark.table("sessions").as[SessionizeStream.ClosedSession].collect()
      assert(rows.length == 1)
      assert(rows(0) == SessionizeStream.ClosedSession(1L, 1000L, 1030L, 2))
    } finally q.stop()
  }
}
