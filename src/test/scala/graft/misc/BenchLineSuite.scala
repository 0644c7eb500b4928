package graft.misc

import graft.{Bench, SparkEntry}
import org.scalatest.funsuite.AnyFunSuite

/** Guards the bench contract line's size. The driver captures only a
  * 2000-byte stdout tail (measured from the BENCH_r18/r19 records) and
  * truncates from the HEAD of the line; rounds 7-8 lost the line (and
  * with it all per-query walls) because full-precision doubles pushed it
  * to ~2.2 kB, round 10's all-names line outgrew the tail budget at 88
  * queries (name mass alone ~1.7 kB), and round 19's contended run pushed
  * 79 queries past the fast threshold, rendered at exactly the old
  * 1930-byte budget, and lost its first 3 bytes — the driver parsed null
  * and recorded every bench query as dropped. The renderer names only
  * queries with wall ≥ 0.5 s and aggregates the rest into a "fast"
  * summary; these tests pin that behavior at the CURRENT query count so
  * growth can't silently re-overflow capture.
  */
class BenchLineSuite extends AnyFunSuite {

  private val names = SparkEntry.queries.keysIterator.toSeq.sorted
  private def bytes(line: String) = line.getBytes("UTF-8").length

  test("worst-case contract line stays under the driver tail capture") {
    // absurd worst case: EVERY query at 999.999 s — the measured sf0.1
    // TOTAL is well under 200 s across all queries, so a 1000-s-per-query
    // line is >100x anything real; beyond it the renderer drops the
    // smallest shown walls into an explicit "omitted" count rather than
    // overflowing
    val line = Bench.renderLine(names.map(_ -> 999.999), 999.999 * names.size,
      "/root/testdata/sf0.1")
    assert(bytes(line) <= Bench.MaxLineBytes,
      s"bench contract line would be ${bytes(line)} bytes (${names.size} " +
        "queries) — over the guard against the driver's ~2048-byte stdout " +
        "tail")
    // drop order is (wall desc, name asc): under all-tied walls the
    // alphabetically-first query survives any shrink rung
    assert(line.contains("\"" + names.head + "\":"),
      "first query's wall must survive the render")
    // anything dropped must be accounted, not silent
    if (!line.contains("\"" + names.last + "\":"))
      assert(line.contains("\"omitted\":"), "dropped walls must be counted")
  }

  test("realistic walls keep full 3-decimal resolution for slow queries") {
    // realistic shape: ~30 multi-second queries, the rest sub-0.5 s.
    // The slow walls must render at 3 decimals with room to spare, and
    // the fast mass must be aggregated with its count and sum visible.
    val (slow, fastQ) = names.splitAt(30)
    val walls = slow.map(_ -> 1.23456789) ++ fastQ.map(_ -> 0.123)
    val line = Bench.renderLine(walls, 40.617, "/root/testdata/sf0.1")
    assert(bytes(line) <= Bench.MaxLineBytes)
    assert(line.contains(":1.235"), "expected 3-decimal rendering")
    assert(line.contains(s""""fast":{"n":${fastQ.size},"""),
      "sub-threshold queries must be aggregated with their count")
    assert(!line.contains("\"omitted\":"),
      "no walls should be dropped in the realistic case")
    assert(line.endsWith("\"sf\":\"/root/testdata/sf0.1\"}"))
  }

  test("all-fast suite renders an empty queries map, nothing lost") {
    val line = Bench.renderLine(names.map(_ -> 0.1), 0.1 * names.size,
      "/root/testdata/sf0.1")
    assert(bytes(line) <= Bench.MaxLineBytes)
    assert(line.contains("\"queries\":{}"))
    assert(line.contains(s""""fast":{"n":${names.size},"""))
  }

  test("the capped final rung bounds per-wall display at any magnitude") {
    val line = Bench.renderLine(names.map(_ -> 1e9), 1e9 * names.size,
      "/root/testdata/sf0.1")
    assert(bytes(line) <= Bench.MaxLineBytes)
    assert(line.contains(":999"), "capped display expected")
  }

  test("budget stays inside the driver's measured 2000-byte tail") {
    // 2000 B of tail − 7 B "[info] " prefix − ~72 B "[success] ..."
    // epilogue − 2 newlines ≈ 1919 B available for the line. The budget
    // must sit under that with margin for epilogue drift (its length
    // varies with the formatted duration and date).
    assert(Bench.MaxLineBytes <= 1900,
      "MaxLineBytes must leave headroom inside the driver's 2000-byte " +
        "stdout tail (~1919 B available after sbt framing) — r19's " +
        "1930-byte line lost its head and voided PERF_r19")
  }

  test("the r19 contended shape (79 slow queries) now fits the tail") {
    // replay of the exact failure: a contended suite run pushed 79
    // queries past the 0.5 s fast threshold with 1-2-digit walls; the
    // renderer fit the line at exactly the old 1930-byte budget and the
    // driver's 2000-byte tail cut its head. Must fit ≤ MaxLineBytes AND
    // the hard 1919-byte driver window.
    val rng = new scala.util.Random(19)
    val walls = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i % 180 < 79) 1.0 + rng.nextDouble() * 40 else 0.1)
    }
    val line = Bench.renderLine(walls, walls.map(_._2).sum,
      "/root/testdata/sf0.1")
    assert(bytes(line) <= Bench.MaxLineBytes)
    assert(bytes(line) <= 1919, "line must fit the driver's hard window")
  }

  test("fmt renders locale-stable 3-decimal seconds") {
    assert(Bench.fmt(1.23456789) == "1.235")
    assert(Bench.fmt(0.0001) == "0.000")
    assert(Bench.fmt(12.0) == "12.000")
  }
}
