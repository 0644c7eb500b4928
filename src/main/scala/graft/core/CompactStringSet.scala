package graft.core

/** An immutable membership set over UTF-8 strings, packed for the
  * multi-million-entry broadcast case (the UT1 blocklist:
  * [[graft.text.UrlFilter.filterByDomainTable]]).
  *
  * A JVM `Set[String]` costs ~60-100 bytes per short entry (String
  * header + backing array header + hash-map node) — several hundred MB
  * of driver heap and broadcast bytes at 5M entries. This layout is
  * three flat arrays: one shared UTF-8 byte pool, an `Int` offset
  * table, and an open-addressed `Int` hash index — entry bytes plus
  * ~10 bytes/entry of overhead (5M × 20-char entries ≈ 150 MB vs
  * ~450 MB), three objects total, so Java serialization for the
  * broadcast is a straight array write.
  *
  * Membership is EXACT (hash then byte-compare — never
  * fingerprint-only, which would wrongly drop documents on collision),
  * and [[containsRegion]] probes a slice of a caller-held byte array,
  * so a per-host dot-boundary suffix chain costs zero allocation per
  * step. Lookups are O(1) expected: FNV-1a over the bytes into a
  * power-of-two table at ≤0.7 load, linear probing.
  */
final class CompactStringSet private (
    pool: Array[Byte], off: Array[Int], idx: Array[Int])
    extends Serializable {

  /** number of entries */
  def size: Int = off.length - 1

  /** approximate heap bytes of the packed structure (pool + tables) */
  def packedBytes: Long =
    pool.length.toLong + 4L * off.length + 4L * idx.length

  def contains(s: String): Boolean = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    containsRegion(b, 0, b.length)
  }

  /** Persist the packed structure so later jobs skip the pack entirely
    * (the UT1 path's distinct+collect+pack costs ~36 s at the 10M-entry
    * nameplate — SCALING.md round 14 — and is identical across every
    * job of a crawl pipeline). Format: magic, version, three
    * length-prefixed flat arrays — a straight channel write, no object
    * serialization. Local filesystem path (driver-side artifact, like
    * the ModelRepo cache). */
  def save(path: String): Unit = {
    import java.nio.file.StandardOpenOption._
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path), CREATE, WRITE, TRUNCATE_EXISTING)
    try {
      val header = java.nio.ByteBuffer.allocate(20)
      header.putInt(CompactStringSet.Magic).putInt(1)
        .putInt(pool.length).putInt(off.length).putInt(idx.length)
      header.flip()
      while (header.hasRemaining) ch.write(header)
      CompactStringSet.writeAll(ch, java.nio.ByteBuffer.wrap(pool))
      CompactStringSet.writeInts(ch, off)
      CompactStringSet.writeInts(ch, idx)
    } finally ch.close()
  }

  /** membership of `bytes[from, from+len)` — allocation-free */
  def containsRegion(bytes: Array[Byte], from: Int, len: Int): Boolean = {
    if (size == 0) return false
    val mask = idx.length - 1
    var slot = (CompactStringSet.hashRegion(bytes, from, len) & mask.toLong).toInt
    var e = idx(slot)
    while (e != 0) {
      val i = e - 1
      val s = off(i); val l = off(i + 1) - s
      if (l == len) {
        var j = 0
        while (j < len && pool(s + j) == bytes(from + j)) j += 1
        if (j == len) return true
      }
      slot = (slot + 1) & mask
      e = idx(slot)
    }
    false
  }
}

object CompactStringSet {

  def apply(entries: Iterable[String]): CompactStringSet = {
    val utf8 = java.nio.charset.StandardCharsets.UTF_8
    val arrs = entries.iterator.map(_.getBytes(utf8)).toArray
    require(arrs.length <= (1 << 29),
      s"CompactStringSet: ${arrs.length} entries exceeds the 2^29 cap")
    var cap = 8
    while (cap < arrs.length.toLong * 10 / 7 + 1) cap <<= 1
    val mask = cap - 1
    val idx = new Array[Int](cap)
    // first pass assigns slots (deduping byte-identical entries), so
    // the pool is sized exactly before it is filled
    val kept = new Array[Boolean](arrs.length)
    var n = 0; var poolLen = 0
    var i = 0
    while (i < arrs.length) {
      val b = arrs(i)
      var slot = (hashRegion(b, 0, b.length) & mask.toLong).toInt
      var dup = false
      var e = idx(slot)
      while (e != 0 && !dup) {
        if (java.util.Arrays.equals(arrs(e - 1), b)) dup = true
        else { slot = (slot + 1) & mask; e = idx(slot) }
      }
      if (!dup) {
        idx(slot) = i + 1
        kept(i) = true; n += 1; poolLen += b.length
      }
      i += 1
    }
    val pool = new Array[Byte](poolLen)
    val off = new Array[Int](n + 1)
    // remap slot values from input index to packed entry index
    val packedOf = new Array[Int](arrs.length)
    var p = 0; var k = 0
    i = 0
    while (i < arrs.length) {
      if (kept(i)) {
        off(k) = p
        System.arraycopy(arrs(i), 0, pool, p, arrs(i).length)
        p += arrs(i).length
        packedOf(i) = k; k += 1
      }
      i += 1
    }
    off(n) = p
    var s = 0
    while (s < cap) {
      if (idx(s) != 0) idx(s) = packedOf(idx(s) - 1) + 1
      s += 1
    }
    new CompactStringSet(pool, off, idx)
  }

  private[core] val Magic = 0x47435353 // "GCSS"

  /** Load a [[save]]d set. The structural invariants are re-validated
    * (cheap linear scans) so a truncated or foreign file fails with a
    * message, never a wrong membership answer. */
  def load(path: String): CompactStringSet = {
    import java.nio.file.StandardOpenOption.READ
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(path), READ)
    try {
      val header = java.nio.ByteBuffer.allocate(20)
      readAll(ch, header, path)
      header.flip()
      val magic = header.getInt(); val version = header.getInt()
      require(magic == Magic && version == 1,
        s"CompactStringSet.load($path): not a v1 CompactStringSet file")
      val poolLen = header.getInt()
      val offLen = header.getInt()
      val idxLen = header.getInt()
      require(poolLen >= 0 && offLen >= 1 && idxLen >= 8 &&
        Integer.bitCount(idxLen) == 1,
        s"CompactStringSet.load($path): corrupt header " +
          s"($poolLen/$offLen/$idxLen)")
      // the header must account for the file exactly BEFORE any array
      // is sized from it — a corrupt length would otherwise attempt a
      // giant allocation just to fail as truncated afterwards
      require(20L + poolLen + 4L * offLen + 4L * idxLen == ch.size(),
        s"CompactStringSet.load($path): header/file-size mismatch")
      val pool = new Array[Byte](poolLen)
      readAll(ch, java.nio.ByteBuffer.wrap(pool), path)
      val off = readInts(ch, offLen, path)
      val idx = readInts(ch, idxLen, path)
      require(ch.position() == ch.size(),
        s"CompactStringSet.load($path): trailing bytes")
      require(off(0) == 0 && off(offLen - 1) == poolLen,
        s"CompactStringSet.load($path): corrupt offset table bounds")
      var i = 1
      while (i < offLen) {
        require(off(i) >= off(i - 1),
          s"CompactStringSet.load($path): offset table not monotone")
        i += 1
      }
      var s = 0
      var occupied = 0L
      while (s < idxLen) {
        require(idx(s) >= 0 && idx(s) < offLen,
          s"CompactStringSet.load($path): index entry out of range")
        if (idx(s) != 0) occupied += 1
        s += 1
      }
      // probe-termination invariant (round-15 advice): open-addressed
      // probing only stops at a zero slot, so a table with NO empty slot
      // would hang containsRegion forever on any miss. A well-formed v1
      // file has exactly offLen-1 occupied slots (one per entry) and the
      // builder caps load factor at 0.7 — enforce both so a crafted/
      // corrupt full table is rejected with a message, not a hang.
      require(occupied == offLen - 1,
        s"CompactStringSet.load($path): index occupancy $occupied != " +
          s"entry count ${offLen - 1}")
      require(occupied <= (idxLen.toLong * 7) / 10,
        s"CompactStringSet.load($path): index over the 0.7 load-factor " +
          "bound — probing could fail to terminate")
      new CompactStringSet(pool, off, idx)
    } finally ch.close()
  }

  private def writeAll(ch: java.nio.channels.FileChannel,
      buf: java.nio.ByteBuffer): Unit =
    while (buf.hasRemaining) ch.write(buf)

  private def writeInts(ch: java.nio.channels.FileChannel,
      a: Array[Int]): Unit = {
    val buf = java.nio.ByteBuffer.allocate(1 << 16)
    var i = 0
    while (i < a.length) {
      buf.clear()
      val n = math.min(a.length - i, buf.capacity() / 4)
      buf.asIntBuffer().put(a, i, n)
      buf.limit(n * 4)
      writeAll(ch, buf)
      i += n
    }
  }

  private def readAll(ch: java.nio.channels.FileChannel,
      buf: java.nio.ByteBuffer, path: String): Unit = {
    while (buf.hasRemaining) {
      require(ch.read(buf) >= 0,
        s"CompactStringSet.load($path): truncated file")
    }
  }

  private def readInts(ch: java.nio.channels.FileChannel, n: Int,
      path: String): Array[Int] = {
    val a = new Array[Int](n)
    val buf = java.nio.ByteBuffer.allocate(1 << 16)
    var i = 0
    while (i < n) {
      buf.clear()
      val k = math.min(n - i, buf.capacity() / 4)
      buf.limit(k * 4)
      readAll(ch, buf, path)
      buf.flip()
      buf.asIntBuffer().get(a, i, k)
      i += k
    }
    a
  }

  /** 64-bit FNV-1a over a byte region */
  private[core] def hashRegion(b: Array[Byte], from: Int, len: Int): Long = {
    var h = 0xcbf29ce484222325L
    var i = from
    val end = from + len
    while (i < end) {
      h ^= (b(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    // finalize: FNV's low bits are weak for short keys; mix before mask
    h ^= h >>> 33
    h *= 0xff51afd7ed558ccdL
    h ^= h >>> 33
    h
  }
}
