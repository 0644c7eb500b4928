package graft.misc

import graft.{Bench, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench contract line's size. The driver captures only a
  * ~2048-byte stdout tail and truncates from the HEAD of the line; rounds
  * 7-8 lost the line (and with it all per-query walls) because
  * full-precision doubles pushed it to ~2.2 kB. The renderer degrades
  * decimal precision until the line fits; these tests pin that behavior at
  * the CURRENT query count so growth can't silently re-overflow capture.
  */
class BenchLineSuite extends AnyFunSuite {

  private val names = SparkEntry.queries.keysIterator.toSeq.sorted

  test("worst-case contract line stays under the driver tail capture") {
    // absurd worst case: every query at 999.999 s — the measured sf0.1
    // TOTAL is ~80 s across all queries, so a 1000-s-per-query line is
    // >100x anything real; beyond it the renderer still degrades
    // (0 decimals, then sf basename) rather than overflowing
    val line = Bench.renderLine(names.map(_ -> 999.999), 999.999 * names.size,
      "/root/testdata/sf0.1")
    val bytes = line.getBytes("UTF-8").length
    assert(bytes <= Bench.MaxLineBytes,
      s"bench contract line would be $bytes bytes (${names.size} queries) — " +
        "over the guard against the driver's ~2048-byte stdout tail; " +
        "shorten query names or move data out of the line")
    assert(line.contains("\"" + names.head + "\":"),
      "first query's wall must survive the render")
  }

  test("realistic walls keep at least 1-decimal resolution") {
    // at 85 queries the name mass alone (~1.26 kB) forces the renderer
    // down to 1-decimal walls; 100 ms resolution is still below the ±50%
    // suite-position noise floor, and target/bench_contract.json carries
    // the full-precision walls regardless
    val line = Bench.renderLine(names.map(_ -> 1.23456789), 86.419,
      "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.MaxLineBytes)
    assert(line.contains(":1.2"), "expected >= 1-decimal rendering")
    // the renderer trades the sf prefix for the decimal — the basename
    // keeps the line identifiable
    assert(line.endsWith("\"sf\":\"sf0.1\"}") ||
      line.endsWith("\"sf\":\"/root/testdata/sf0.1\"}"))
  }

  test("the capped final rung bounds per-wall display at any magnitude") {
    val line = Bench.renderLine(names.map(_ -> 1e9), 1e9 * names.size,
      "/root/testdata/sf0.1")
    assert(line.getBytes("UTF-8").length <= Bench.MaxLineBytes)
    assert(line.contains(":999"), "capped display expected")
  }

  test("fmt renders locale-stable 3-decimal seconds") {
    assert(Bench.fmt(1.23456789) == "1.235")
    assert(Bench.fmt(0.0001) == "0.000")
    assert(Bench.fmt(12.0) == "12.000")
  }
}
