package graft.io.binary

/** Real video decode for the one container/codec readable with zero
  * external libraries: YUV4MPEG2 (`.y4m`) — a plain-text header
  * (`YUV4MPEG2 W.. H.. F<num>:<den> .. C<chroma>`) followed by
  * uncompressed planar YUV frames, each introduced by a `FRAME` line.
  * This is the interchange format of the reference codec world (y4m is
  * what ffmpeg/x264 pipe between tools), so "a user hands us raw video"
  * is exactly this payload. Compressed containers (MP4/H.264 etc.) stay
  * on the stub path — no codec ships in the JDK.
  *
  * Produces a fixed-`dim` feature vector with a documented layout:
  *
  * {{{ [durationSec, fps, width, height, frameCount, lumaMean, env_0 … env_{dim-7}] }}}
  *
  * where `lumaMean` is the mean Y-plane sample over all frames scaled to
  * [0,1], and `env_i` is the mean luma of the i-th of `dim - 6`
  * equal-length runs of frames (a coarse brightness envelope — the
  * video analogue of [[AudioFeatures]]' loudness envelope). A real
  * embedding model would replace the envelope tail; the header fields,
  * frame walk, and luma statistics are exact.
  *
  * Chroma modes: C420 (all variants: jpeg/mpeg2/paldv), C422, C444,
  * Cmono — only the plane SIZES matter here (the chroma planes are
  * skipped, luma is what the features read). Returns None for anything
  * that is not structurally valid Y4M (the caller decides between stub
  * fallback and failure).
  */
object VideoFeatures {

  /** Sanity bound on frame dimensions: 16384×16384 luma = 256 MB/frame.
    * Headers beyond this are treated as corrupt rather than allocated
    * for (the per-frame means array is the only allocation that scales
    * with frame count, and frame count is bounded by payload size /
    * frame size, so a hostile header cannot inflate memory). */
  val MaxDim = 16384

  private def lineEnd(b: Array[Byte], from: Int, limit: Int): Int = {
    var i = from
    val max = math.min(b.length, from + limit)
    while (i < max && b(i) != '\n') i += 1
    if (i < max) i else -1
  }

  /** Frame-walk front half shared by [[decodeY4mFeatures]] and
    * [[VideoFingerprint.fp64]]: per-frame mean luma in [0, 1] plus
    * (fps, width, height). None for anything structurally invalid. */
  private[binary] def frameLumaMeans(
      bytes: Array[Byte]): Option[(Array[Double], Double, Int, Int)] = {
    if (bytes == null || bytes.length < 16) return None
    try {
      val headEnd = lineEnd(bytes, 0, 2048)
      if (headEnd < 0) return None
      val header = new String(bytes, 0, headEnd, "US-ASCII")
      if (!header.startsWith("YUV4MPEG2")) return None
      var w = -1; var h = -1; var fpsNum = -1L; var fpsDen = -1L
      var chroma = "420jpeg" // Y4M default when no C tag is present
      header.split(' ').iterator.drop(1).filter(_.nonEmpty).foreach { tok =>
        (tok.charAt(0), tok.substring(1)) match {
          case ('W', v) => w = v.toInt
          case ('H', v) => h = v.toInt
          case ('F', v) =>
            val c = v.indexOf(':')
            if (c <= 0) return None
            fpsNum = v.substring(0, c).toLong
            fpsDen = v.substring(c + 1).toLong
          case ('C', v) => chroma = v
          case _ => // I (interlace), A (aspect), X (extension): irrelevant
        }
      }
      if (w <= 0 || h <= 0 || w > MaxDim || h > MaxDim ||
          fpsNum <= 0 || fpsDen <= 0) return None
      val ySize = w * h
      val halfW = (w + 1) / 2
      val halfH = (h + 1) / 2
      val chromaSize = chroma match {
        case c if c.startsWith("420") => 2 * halfW * halfH
        case c if c.startsWith("422") => 2 * halfW * h
        case c if c.startsWith("444") => 2 * ySize
        case c if c.startsWith("mono") => 0
        case _ => return None
      }
      // walk the frames, accumulating per-frame mean luma
      val frameMeans = scala.collection.mutable.ArrayBuffer.empty[Double]
      var off = headEnd + 1
      while (off < bytes.length) {
        val fEnd = lineEnd(bytes, off, 1024)
        if (fEnd < 0) return None
        val fLine = new String(bytes, off, fEnd - off, "US-ASCII")
        if (!fLine.startsWith("FRAME")) return None
        val yStart = fEnd + 1
        if (yStart + ySize + chromaSize > bytes.length) return None
        var sum = 0L
        var i = yStart
        val yHi = yStart + ySize
        while (i < yHi) { sum += bytes(i) & 0xff; i += 1 }
        frameMeans += sum.toDouble / ySize / 255.0
        off = yHi + chromaSize
      }
      val n = frameMeans.length
      if (n == 0) return None
      val fps = fpsNum.toDouble / fpsDen
      Some((frameMeans.toArray, fps, w, h))
    } catch {
      case _: Exception => None
    }
  }

  def decodeY4mFeatures(bytes: Array[Byte], dim: Int): Option[Array[Float]] = {
    if (dim < 7) return None
    frameLumaMeans(bytes).map { case (frameMeans, fps, w, h) =>
      val n = frameMeans.length
      val out = new Array[Float](dim)
      out(0) = (n / fps).toFloat
      out(1) = fps.toFloat
      out(2) = w.toFloat
      out(3) = h.toFloat
      out(4) = n.toFloat
      out(5) = (frameMeans.sum / n).toFloat
      val segs = dim - 6
      var s = 0
      while (s < segs) {
        val lo = (s.toLong * n / segs).toInt
        val hi = ((s + 1).toLong * n / segs).toInt
        var acc = 0.0
        var j = lo
        while (j < hi) { acc += frameMeans(j); j += 1 }
        out(6 + s) = if (hi > lo) (acc / (hi - lo)).toFloat else 0f
        s += 1
      }
      out
    }
  }
}
