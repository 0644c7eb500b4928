package graft.nn

import scala.collection.mutable

/** Serializable ball tree for exact k-nearest-neighbor search (Euclidean).
  * Built once (driver), broadcast, queried per row inside tasks — the
  * reference's execution pattern (ref: nn/BallTree.scala:109-156, KNN
  * fitting collects to driver per OptimizedCKNNFitting.scala:50-78).
  *
  * Pruning bound: a node can contain a better neighbor only if
  * dist(q, center) - radius < worst-kept-distance.
  */
class BallTree(
    points: Array[Array[Double]],
    ids: Array[Long],
    labels: Array[Int], // optional conditioner labels; empty = none
    leafSize: Int = 50) extends Serializable {

  require(points.length == ids.length)
  private val n = points.length
  private val dim = if (n == 0) 0 else points(0).length
  // permutation of point indices; nodes own contiguous [start,end) ranges
  private val idx: Array[Int] = Array.tabulate(n)(identity)

  private case class Node(center: Array[Double], radius: Double,
      start: Int, end: Int, left: Int, right: Int)
  private val nodes = mutable.ArrayBuffer.empty[Node]
  if (n > 0) build(0, n)

  private def dist(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
    math.sqrt(s)
  }

  /** Builds the subtree over idx[start,end); returns node position. */
  private def build(start: Int, end: Int): Int = {
    val center = new Array[Double](dim)
    var i = start
    while (i < end) {
      val p = points(idx(i)); var d = 0
      while (d < dim) { center(d) += p(d); d += 1 }
      i += 1
    }
    var d = 0
    while (d < dim) { center(d) /= (end - start); d += 1 }
    var radius = 0.0
    i = start
    while (i < end) {
      radius = math.max(radius, dist(points(idx(i)), center)); i += 1
    }
    val pos = nodes.length
    nodes += Node(center, radius, start, end, -1, -1)
    if (end - start > leafSize) {
      // split along direction of two approximately-farthest points
      val p1 = points(idx((start until end).maxBy(j => dist(points(idx(j)), center))))
      val p2 = points(idx((start until end).maxBy(j => dist(points(idx(j)), p1))))
      val proj = new Array[Double](end - start)
      i = start
      while (i < end) {
        val p = points(idx(i)); var s = 0.0; var dd = 0
        while (dd < dim) { s += p(dd) * (p1(dd) - p2(dd)); dd += 1 }
        proj(i - start) = s; i += 1
      }
      // partition around median projection (quickselect via sort of range)
      val order = (start until end).sortBy(j => proj(j - start))
      val sortedIdx = order.map(idx(_)).toArray
      System.arraycopy(sortedIdx, 0, idx, start, sortedIdx.length)
      val mid = start + (end - start) / 2
      if (mid > start && mid < end) {
        val left = build(start, mid)
        val right = build(mid, end)
        nodes(pos) = nodes(pos).copy(left = left, right = right)
      }
    }
    pos
  }

  /** k nearest neighbors of q, optionally restricted to `allowed` labels.
    * Returns (distance, id) ascending. */
  def search(q: Array[Double], k: Int,
      allowed: Set[Int] = Set.empty): Seq[(Double, Long)] = {
    if (n == 0) return Nil
    // max-heap on distance: head = worst kept
    implicit val heapOrd: Ordering[(Double, Long)] =
      new Ordering[(Double, Long)] {
        def compare(a: (Double, Long), b: (Double, Long)): Int = {
          // head must be the lexicographic (distance asc, id asc) MAXIMUM —
          // i.e. among tied worst distances the LARGEST id — so the eviction
          // rule below can replace it with an equal-distance smaller id and
          // the kept k-set is deterministic regardless of traversal order
          val c = java.lang.Double.compare(a._1, b._1)
          if (c != 0) c else java.lang.Long.compare(a._2, b._2)
        }
      }
    val heap = mutable.PriorityQueue.empty[(Double, Long)]
    def visit(nodePos: Int): Unit = {
      val node = nodes(nodePos)
      val dc = dist(q, node.center)
      // strict inequality: a node at exactly the boundary distance may
      // still hold an equal-distance SMALLER-id point that must win the
      // (distance asc, id asc) tie-break below
      if (heap.size >= k && dc - node.radius > heap.head._1) return
      if (node.left < 0) {
        var i = node.start
        while (i < node.end) {
          val pi = idx(i)
          if (allowed.isEmpty || (labels.nonEmpty && allowed.contains(labels(pi)))) {
            val d = dist(q, points(pi))
            if (heap.size < k) heap.enqueue((d, ids(pi)))
            // replace on strictly smaller distance OR an equal-distance
            // smaller id: the kept set is then exactly the k smallest
            // under (distance asc, id asc) — deterministic regardless of
            // traversal order, which per-partition distributed search
            // (PartitionedKNN) relies on when merging tied candidates
            else if (d < heap.head._1 ||
                (d == heap.head._1 && ids(pi) < heap.head._2)) {
              heap.dequeue(); heap.enqueue((d, ids(pi)))
            }
          }
          i += 1
        }
      } else {
        // nearer child first for tighter early bounds
        val dl = dist(q, nodes(node.left).center)
        val dr = dist(q, nodes(node.right).center)
        if (dl <= dr) { visit(node.left); visit(node.right) }
        else { visit(node.right); visit(node.left) }
      }
    }
    visit(0)
    heap.dequeueAll.reverse.toSeq
  }
}
