package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CompactStringSetSuite extends AnyFunSuite {

  test("membership is exact against a reference Set, incl. unicode") {
    val rnd = new scala.util.Random(7)
    val entries = (1 to 5000).map { i =>
      if (i % 17 == 0) s"bücher-$i.xn--de"          // multibyte UTF-8
      else if (i % 23 == 0) s"例え-$i.jp"
      else s"host${rnd.nextInt(100000)}.example$i.com"
    }
    val ref = entries.toSet
    val cs = CompactStringSet(entries ++ entries.take(100)) // dup inputs
    assert(cs.size == ref.size)
    ref.foreach(e => assert(cs.contains(e), e))
    assert(!cs.contains("absent.com"))
    assert(!cs.contains(""))
    assert(!cs.contains("host.example1.com.suffix"))
    // near-misses sharing prefixes/suffixes with real entries
    entries.take(200).foreach { e =>
      assert(!cs.contains(e + "x"))
      assert(!cs.contains(e.dropRight(1)))
    }
  }

  test("containsRegion probes byte slices without allocation semantics") {
    val cs = CompactStringSet(Seq("evil.com", "xyz.blogspot.com"))
    val hb = "a.xyz.blogspot.com".getBytes("UTF-8")
    assert(!cs.containsRegion(hb, 0, hb.length))
    assert(cs.containsRegion(hb, 2, hb.length - 2))   // xyz.blogspot.com
    assert(!cs.containsRegion(hb, 6, hb.length - 6))  // blogspot.com
    val eb = "evil.com".getBytes("UTF-8")
    assert(cs.containsRegion(eb, 0, eb.length))
    assert(!cs.containsRegion(eb, 0, eb.length - 1))
  }

  test("save/load round-trips bit-exact membership, rejects corrupt files") {
    val dir = java.nio.file.Files.createTempDirectory("csets").toString
    val entries = (1 to 3000).map(i =>
      if (i % 13 == 0) s"bücher-$i.例え.jp" else s"dom$i.example.com")
    val cs = CompactStringSet(entries)
    val path = s"$dir/pack.gcss"
    cs.save(path)
    val back = CompactStringSet.load(path)
    assert(back.size == cs.size && back.packedBytes == cs.packedBytes)
    entries.foreach(e => assert(back.contains(e), e))
    assert(!back.contains("absent.com") && !back.contains("dom1.example.co"))
    // empty set round-trips too
    val emptyPath = s"$dir/empty.gcss"
    CompactStringSet(Nil).save(emptyPath)
    assert(CompactStringSet.load(emptyPath).size == 0)
    // truncated file fails with a message, never wrong membership
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path))
    val truncPath = s"$dir/trunc.gcss"
    java.nio.file.Files.write(java.nio.file.Paths.get(truncPath),
      java.util.Arrays.copyOf(bytes, bytes.length / 2))
    val e1 = intercept[IllegalArgumentException] {
      CompactStringSet.load(truncPath)
    }
    assert(e1.getMessage.contains("mismatch") ||
      e1.getMessage.contains("truncated"))
    // a foreign file fails on the magic
    val junkPath = s"$dir/junk.gcss"
    java.nio.file.Files.write(java.nio.file.Paths.get(junkPath),
      Array.fill[Byte](64)(42))
    val e2 = intercept[IllegalArgumentException] {
      CompactStringSet.load(junkPath)
    }
    assert(e2.getMessage.contains("not a v1"))
  }

  test("load fuzz: byte-mutated files fail cleanly or stay probe-safe") {
    // single-byte corruption anywhere in the file must either trip a
    // validation require (IllegalArgumentException with the path) or —
    // when the mutation lands in the pool, which IS the entry data —
    // load a structurally-valid different set whose probes terminate
    val dir = java.nio.file.Files.createTempDirectory("csfz")
    val cs = CompactStringSet((1 to 500).map(i => s"dom$i.example.com"))
    val path = dir.resolve("base.gcss")
    cs.save(path.toString)
    val bytes = java.nio.file.Files.readAllBytes(path)
    val rnd = new scala.util.Random(42)
    val mutPath = dir.resolve("mut.gcss").toString
    (1 to 100).foreach { _ =>
      val b = bytes.clone()
      val at = rnd.nextInt(b.length)
      b(at) = (b(at) ^ (1 << rnd.nextInt(8))).toByte
      java.nio.file.Files.write(java.nio.file.Paths.get(mutPath), b)
      try {
        val loaded = CompactStringSet.load(mutPath)
        // probes over hit/miss/multibyte keys must terminate normally
        loaded.contains("dom1.example.com")
        loaded.contains("absent.org")
        loaded.contains("bücher.例え.jp")
      } catch {
        case e: IllegalArgumentException =>
          assert(e.getMessage.contains(mutPath))
      }
    }
  }

  test("a crafted FULL index (no zero slot) is rejected, not probed") {
    // probing only stops at a zero slot: a v1 file whose idx array has
    // no empty slot would send containsRegion into an infinite loop on
    // any miss (round-15 advice) — load must reject it with a message
    val dir = java.nio.file.Files.createTempDirectory("csfull")
    val cs = CompactStringSet(Seq("only.example.com"))
    val path = dir.resolve("full.gcss")
    cs.save(path.toString)
    val bytes = java.nio.file.Files.readAllBytes(path)
    // layout: 20-byte header, pool, (n+1) offsets, idx — fill every idx
    // slot with entry reference 1 (in range, so the old per-slot range
    // check passed and the load hung at first miss)
    val poolLen = "only.example.com".getBytes("UTF-8").length
    val idxStart = 20 + poolLen + 4 * 2
    val buf = java.nio.ByteBuffer.wrap(bytes)
    ((idxStart until bytes.length) by 4).foreach(p => buf.putInt(p, 1))
    java.nio.file.Files.write(path, bytes)
    val e = intercept[IllegalArgumentException] {
      CompactStringSet.load(path.toString)
    }
    assert(e.getMessage.contains("occupancy") ||
      e.getMessage.contains("load-factor"))
  }

  test("empty set and survives a serialization round-trip") {
    val empty = CompactStringSet(Nil)
    assert(empty.size == 0 && !empty.contains("x"))
    val cs = CompactStringSet(Seq("a.com", "b.org"))
    val bos = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bos)
    oos.writeObject(cs); oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bos.toByteArray))
      .readObject().asInstanceOf[CompactStringSet]
    assert(back.contains("a.com") && back.contains("b.org") &&
      !back.contains("c.net"))
    assert(cs.packedBytes > 0)
  }
}
