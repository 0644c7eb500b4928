package graft.image

/** SLIC-style superpixel segmentation (public algorithm: Achanta et al.,
  * "SLIC Superpixels", 2010; ref use: lime/Superpixel.scala:1-334 — the
  * reference clusters pixels the same way to build LIME's interpretable
  * image features). Pure JVM, operates on the ImageSchema BGR byte
  * layout.
  */
object Superpixel {

  /** Segment an h×w BGR image into ~targetSegments superpixels.
    * Returns (labels row-major, number of segments). */
  def segment(height: Int, width: Int, data: Array[Byte],
              targetSegments: Int, compactness: Double = 20.0,
              iterations: Int = 5): (Array[Int], Int) = {
    val n = height * width
    val k = math.max(1, math.min(targetSegments, n))
    val step = math.max(1, math.sqrt(n.toDouble / k).toInt)

    // init centers on a regular grid: (y, x, b, g, r)
    val centers = scala.collection.mutable.ArrayBuffer.empty[Array[Double]]
    var cy = step / 2
    while (cy < height) {
      var cx = step / 2
      while (cx < width) {
        val base = (cy * width + cx) * 3
        centers += Array(cy.toDouble, cx.toDouble,
          (data(base) & 0xff).toDouble, (data(base + 1) & 0xff).toDouble,
          (data(base + 2) & 0xff).toDouble)
        cx += step
      }
      cy += step
    }
    val nc = centers.length
    val labels = Array.fill(n)(-1)
    val dists = Array.fill(n)(Double.MaxValue)
    val m2 = (compactness / step) * (compactness / step)

    var it = 0
    while (it < iterations) {
      java.util.Arrays.fill(dists, Double.MaxValue)
      var c = 0
      while (c < nc) {
        val ctr = centers(c)
        val y0 = math.max(0, ctr(0).toInt - 2 * step)
        val y1 = math.min(height - 1, ctr(0).toInt + 2 * step)
        val x0 = math.max(0, ctr(1).toInt - 2 * step)
        val x1 = math.min(width - 1, ctr(1).toInt + 2 * step)
        var y = y0
        while (y <= y1) {
          var x = x0
          while (x <= x1) {
            val p = y * width + x
            val base = p * 3
            val db = (data(base) & 0xff) - ctr(2)
            val dg = (data(base + 1) & 0xff) - ctr(3)
            val dr = (data(base + 2) & 0xff) - ctr(4)
            val dxy = (y - ctr(0)) * (y - ctr(0)) + (x - ctr(1)) * (x - ctr(1))
            val d = db * db + dg * dg + dr * dr + m2 * dxy
            if (d < dists(p)) { dists(p) = d; labels(p) = c }
            x += 1
          }
          y += 1
        }
        c += 1
      }
      // recompute centers
      val acc = Array.fill(nc)(new Array[Double](6)) // y,x,b,g,r,count
      var p = 0
      while (p < n) {
        val l = labels(p)
        if (l >= 0) {
          val a = acc(l)
          a(0) += p / width; a(1) += p % width
          a(2) += data(p * 3) & 0xff
          a(3) += data(p * 3 + 1) & 0xff
          a(4) += data(p * 3 + 2) & 0xff
          a(5) += 1
        }
        p += 1
      }
      c = 0
      while (c < nc) {
        val a = acc(c)
        if (a(5) > 0) centers(c) = Array(
          a(0) / a(5), a(1) / a(5), a(2) / a(5), a(3) / a(5), a(4) / a(5))
        c += 1
      }
      it += 1
    }
    // orphaned pixels (never visited by any center window) -> nearest center
    var p = 0
    while (p < n) {
      if (labels(p) < 0) {
        val y = p / width; val x = p % width
        var best = 0; var bd = Double.MaxValue
        var c = 0
        while (c < nc) {
          val d = (y - centers(c)(0)) * (y - centers(c)(0)) +
            (x - centers(c)(1)) * (x - centers(c)(1))
          if (d < bd) { bd = d; best = c }
          c += 1
        }
        labels(p) = best
      }
      p += 1
    }
    (labels, nc)
  }

  /** Apply a segment on/off mask: masked-off pixels become `fill`. */
  def mask(data: Array[Byte], labels: Array[Int], keep: Array[Boolean],
           fill: Byte = 0): Array[Byte] = {
    val out = new Array[Byte](data.length)
    var p = 0
    while (p < labels.length) {
      if (keep(labels(p))) {
        out(p * 3) = data(p * 3)
        out(p * 3 + 1) = data(p * 3 + 1)
        out(p * 3 + 2) = data(p * 3 + 2)
      } else {
        out(p * 3) = fill; out(p * 3 + 1) = fill; out(p * 3 + 2) = fill
      }
      p += 1
    }
    out
  }
}
