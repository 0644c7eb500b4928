package graft.dedup

import graft.TestBase
import org.apache.spark.sql.functions._

/** Property-style pins for the round-17 kernel fixes: the pigeonhole
  * completeness guarantee every fingerprint deduper's recall rides on,
  * the width-64-safe block mask (a real silent-miss bug at blocks=1),
  * and the BoundedCellAggregator's cap semantics under arbitrary
  * insert/merge orders (the amortized-compaction rewrite must keep the
  * eager formulation's survivors and dropped counts exactly). */
class KernelPropertiesSuite extends TestBase {
  import spark.implicits._

  test("hammingDupIds finds exact duplicates at blocks=1/maxHamming=0 " +
    "(width-64 mask regression)") {
    // pre-round-17, the (1L << 64) - 1 mask overflowed to 0 at a 64-bit
    // block: every key collapsed into ONE bucket, the maxBucketSize
    // skew guard silently dropped all candidates, and this legal
    // parameterization missed every duplicate
    val df = Seq(
      (1L, 0x0123456789abcdefL), (2L, 0x0123456789abcdefL),
      (3L, -1L), (4L, Long.MinValue), (5L, Long.MinValue),
      (6L, 42L)).toDF("id", "fp")
    val dups = DedupFunctions
      .hammingDupIds(df, col("id"), "fp", 0, 1, 1000, "t")
      .as[Long].collect().sorted.toSeq
    assert(dups == Seq(2L, 5L))
  }

  test("pigeonhole completeness: any pair within maxHamming shares a key") {
    // the Manku guarantee: flip <= maxHamming bits and at least one of
    // the C(blocks, blocks-maxHamming) block combinations is untouched,
    // so the pair shares that combo's key — exercised across every
    // block parameterization the fingerprint family accepts, including
    // the width-64 single-block edge
    import graft.streaming.StreamingFingerprintDeduplicator.pigeonKeys
    val rnd = new scala.util.Random(42)
    val params = Seq((6, 4), (4, 3), (8, 2), (1, 0), (2, 1), (5, 4))
    for (trial <- 1 to 500) {
      val fp = rnd.nextLong()
      val (blocks, mh) = params(trial % params.length)
      val nFlips = rnd.nextInt(mh + 1)
      val flips = rnd.shuffle((0 until 64).toList).take(nFlips)
      val fp2 = flips.foldLeft(fp)((a, b) => a ^ (1L << b))
      val shared = pigeonKeys(fp, blocks, mh)
        .intersect(pigeonKeys(fp2, blocks, mh))
      assert(shared.nonEmpty,
        s"trial $trial: ($blocks,$mh) pair at hamming $nFlips shares no key")
    }
  }

  test("BoundedCellAggregator keeps the max smallest ids and counts " +
    "every drop, under any insert/merge order") {
    import SemDeDup.{BoundedCellAggregator, CellBuffer, CellEntry}
    val rnd = new scala.util.Random(7)
    for (trial <- 1 to 100) {
      val max = 1 + rnd.nextInt(8) + 1 // 2..9 (param floor is > 1)
      val n = rnd.nextInt(60)
      val ids = rnd.shuffle((0 until 200).toList).take(n).map(_.toLong)
      val agg = new BoundedCellAggregator(max)
      // random partition into sub-streams, each reduced independently,
      // then merged in random order — the distributed execution shapes
      val parts = ids.grouped(1 + rnd.nextInt(7)).toList.map(chunk =>
        chunk.foldLeft(agg.zero)((b, id) =>
          agg.reduce(b, CellEntry(id, Seq(id.toDouble), 0.0))))
      val merged = rnd.shuffle(parts)
        .foldLeft(agg.zero)((a, b) => agg.merge(a, b))
      val out = agg.finish(merged)
      val expected = ids.sorted.take(max)
      assert(out.entries.map(_.id) == expected,
        s"trial $trial (max=$max, n=$n)")
      assert(out.dropped == math.max(0, n - max).toLong,
        s"trial $trial dropped ${out.dropped} != ${math.max(0, n - max)}")
      // payload rides with its id
      out.entries.foreach(e => assert(e.v == Seq(e.id.toDouble)))
    }
  }

}
