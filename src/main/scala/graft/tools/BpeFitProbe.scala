package graft.tools

/** One-off timing backing the round-12 BPE trainer change: the driver
  * merge LOOP's wall at the 8192-merge / 65536-type defaults, committed
  * (incremental pair re-count + lazy-deletion heap, [[graft.text.BPE
  * .learnMerges]]) vs the previous full-rescan formulation re-run here
  * for comparison — same dictionary, merges asserted identical. The
  * driver fixture's vocabulary is too small to stress the loop (its
  * word-type count dries up after a few hundred merges), so the
  * dictionary is synthesized: Zipf counts over seeded random words —
  * diversity comparable to a real web corpus slice.
  *
  * Usage: graft.tools.BpeFitProbe [numTypes] [numMerges]
  */
object BpeFitProbe {
  def main(args: Array[String]): Unit = {
    val numTypes = if (args.length > 0) args(0).toInt else 65536
    val numMerges = if (args.length > 1) args(1).toInt else 8192
    val rnd = new scala.util.Random(42)
    val dict: Array[(String, Long)] = Array.tabulate(numTypes) { i =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
      w -> math.max(1L, (numTypes.toLong * 10) / (i + 1)) // Zipf-ish
    }.distinct

    import graft.text.BPE._
    val t0 = System.nanoTime()
    val inc = learnMerges(dict, numMerges)
    val tNew = (System.nanoTime() - t0) / 1e9
    println(f"incremental loop: $tNew%8.2f s (${inc.length} merges)")

    val t1 = System.nanoTime()
    var words = dict.map { case (w, c) => (symbols(w), c) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && merges.length < numMerges) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      for ((syms, c) <- words; i <- 0 until syms.length - 1)
        counts.updateWith((syms(i), syms(i + 1)))(o => Some(o.getOrElse(0L) + c))
      if (counts.isEmpty) go = false
      else {
        val best = counts.minBy { case ((a, b), n) => (-n, a, b) }
        if (best._2 < 2) go = false
        else {
          merges += best._1
          words = words.map { case (s, c) =>
            (mergePair(s, best._1._1, best._1._2), c)
          }
        }
      }
    }
    val tOld = (System.nanoTime() - t1) / 1e9
    println(f"full-rescan loop: $tOld%8.2f s (${merges.length} merges)")
    println(s"identical: ${inc.toSeq == merges.toSeq}")
  }
}
