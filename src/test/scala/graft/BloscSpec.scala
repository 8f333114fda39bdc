package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.zonal.Blosc

/** Blosc1 frame codec gates: hand-assembled frames pin the exact byte
  * layout the decoder must speak (independent of [[Blosc.compress]] —
  * the Zarr oracle gates the writer+reader pair; these gate the reader
  * alone), plus named refusals, truncation loudness, and roundtrip
  * properties across codec × shuffle × size (incl. leftover blocks and
  * the memcpy fallback).
  */
class BloscSpec extends AnyFunSuite {

  private def le32(v: Int): Array[Byte] = java.nio.ByteBuffer.allocate(4)
    .order(java.nio.ByteOrder.LITTLE_ENDIAN).putInt(v).array()

  /** Hand-assemble a frame: header + bstarts + given stream blobs. */
  private def frame(flags: Int, typesize: Int, nbytes: Int, blocksize: Int,
      body: Array[Byte], nblocksOverride: Int = -1,
      bstartsOverride: Seq[Int] = null): Array[Byte] = {
    val nblocks =
      if (nblocksOverride >= 0) nblocksOverride
      else (nbytes + blocksize - 1) / blocksize
    val bstarts =
      if (bstartsOverride != null) bstartsOverride
      else Seq(16 + 4 * nblocks) // single block at the body start
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](2, 1, flags.toByte, typesize.toByte))
    out.write(le32(nbytes)); out.write(le32(blocksize))
    out.write(le32(16 + 4 * nblocks + body.length))
    bstarts.foreach(b => out.write(le32(b)))
    out.write(body)
    out.toByteArray
  }

  test("hand-assembled zlib frame, no shuffle, dont_split: exact bytes") {
    val payload = Array.tabulate[Byte](48)(i => (i % 8).toByte)
    val d = new java.util.zip.Deflater(6)
    d.setInput(payload); d.finish()
    val buf = new Array[Byte](256)
    val n = d.deflate(buf); d.end()
    val body = le32(n) ++ buf.take(n)
    // flags: dont_split (0x10) | zlib (3 << 5)
    val f = frame(0x10 | (3 << 5), 1, 48, 48, body)
    assert(Blosc.decompress(f, 48).toSeq == payload.toSeq)
  }

  test("hand-assembled SPLIT lz4 frame with byte shuffle: planes reassemble") {
    // 6 int16 elements (typesize 2), one block of 12 bytes, split into
    // 2 streams = the 2 byte planes of the shuffled block; each stream
    // stored RAW (cbytes == neblock) — the raw-stream fallback path.
    val payload = Array[Byte](1, 10, 2, 20, 3, 30, 4, 40, 5, 50, 6, 60)
    val lo = Array[Byte](1, 2, 3, 4, 5, 6) // byte plane 0
    val hi = Array[Byte](10, 20, 30, 40, 50, 60) // byte plane 1
    val body = le32(6) ++ lo ++ le32(6) ++ hi
    // flags: shuffle (0x01) | lz4 (1 << 5), split (bit4 clear)
    val f = frame(0x01 | (1 << 5), 2, 12, 12, body)
    assert(Blosc.decompress(f, 12).toSeq == payload.toSeq)
  }

  test("memcpy'd frame returns the raw payload") {
    val payload = Array.tabulate[Byte](24)(i => i.toByte)
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array[Byte](2, 1, (0x02 | (1 << 5)).toByte, 4))
    out.write(le32(24)); out.write(le32(24)); out.write(le32(16 + 24))
    out.write(payload)
    assert(Blosc.decompress(out.toByteArray, 24).toSeq == payload.toSeq)
  }

  test("truncated frame fails loudly on the cbytes accounting") {
    val f = Blosc.compress(Array.tabulate[Byte](100)(_.toByte), 4, "lz4", shuffle = true)
    val cut = java.util.Arrays.copyOfRange(f, 0, f.length - 3)
    val e = intercept[IllegalArgumentException](Blosc.decompress(cut, 100))
    assert(e.getMessage.contains("truncated"))
  }

  test("named refusals: both shuffle bits, unknown codec id, ambiguous pre-1.11 split") {
    def hdr(flags: Int, typesize: Int = 4): Array[Byte] =
      frame(flags, typesize, 16, 16, le32(16) ++ new Array[Byte](16))
    // byte- AND bit-shuffle set together is corrupt, not a choice
    val bit = intercept[IllegalArgumentException](
      Blosc.decompress(hdr(0x01 | 0x04 | (1 << 5)), 16))
    assert(bit.getMessage.contains("BOTH shuffle bits"))
    val un = intercept[RuntimeException](Blosc.decompress(hdr(0x10 | (5 << 5)), 16))
    assert(un.getMessage.contains("codec id 5"))
    // split frame (bit4 clear) with typesize 20 > 16: ambiguous pre-1.11
    val amb = intercept[IllegalArgumentException](
      Blosc.decompress(frame(1 << 5, 20, 20, 20, le32(20) ++ new Array[Byte](20)), 20))
    assert(amb.getMessage.contains("pre-1.11"))
  }

  test("hand-assembled blosclz stream: every token form decodes exactly") {
    // decoded target: "abcabcabcabcXYXYXYXYXYXY..." built from
    //  1. literal run "abc"                      → ctrl 2, 3 bytes
    //  2. overlapping match d=3, L=9 (long form) → (7<<5)|0, len-extra
    //     0, dist-low 2  → "abcabcabc" ×3 extension from 3 seed bytes
    //  3. literal run "XY"                       → ctrl 1, 2 bytes
    //  4. short match d=2, L=8                   → (6<<5)|0, low 1
    //  5. far-form match d=8192 is out of range here; instead pin the
    //     255-continued long length: d=2, L=264 = 9+255+0
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(2); bo.write('a'); bo.write('b'); bo.write('c')   // lits "abc"
    bo.write((7 << 5) | 0); bo.write(0); bo.write(2)           // match L=9 d=3
    bo.write(1); bo.write('X'); bo.write('Y')                  // lits "XY"
    bo.write((6 << 5) | 0); bo.write(1)                        // match L=8 d=2
    bo.write((7 << 5) | 0); bo.write(255); bo.write(0); bo.write(1) // L=264 d=2
    val stream = bo.toByteArray
    val want = new StringBuilder
    want.append("abc").append("abcabcabc").append("XY")
    for (_ <- 0 until 4) want.append("XY")
    for (i <- 0 until 264) want.append(if (i % 2 == 0) 'X' else 'Y')
    val dst = new Array[Byte](want.length)
    val n = Blosc.blosclzDecompress(stream, 0, stream.length, dst, 0, want.length)
    assert(n == want.length)
    assert(new String(dst, "US-ASCII") == want.toString)
    // the FIRST token's high bits are masked: prepending (6<<5) to a
    // literal ctrl byte must still read as a literal run
    val masked = Array[Byte](((6 << 5) | 2).toByte, 'a', 'b', 'c')
    val d3 = new Array[Byte](3)
    assert(Blosc.blosclzDecompress(masked, 0, masked.length, d3, 0, 3) == 3)
    assert(new String(d3, "US-ASCII") == "abc")
    // malformed: match underrunning the block start is loud
    val bad = Array[Byte](0, 'a', ((1 << 5) | 0).toByte, 9)
    val e = intercept[IllegalArgumentException](
      Blosc.blosclzDecompress(bad, 0, bad.length, new Array[Byte](16), 0, 16))
    assert(e.getMessage.contains("underruns"))
  }

  test("blosclz encoder↔decoder roundtrip incl. long matches and noise") {
    val rnd = new scala.util.Random(11)
    for (n <- Seq(1, 3, 40, 1000, 70000)) {
      val structured = Array.tabulate[Byte](n)(i => ((i / 17) % 5 + (i % 4) * 30).toByte)
      val enc = Blosc.blosclzCompress(structured, 0, n)
      if (enc != null) {
        val dec = new Array[Byte](n)
        assert(Blosc.blosclzDecompress(enc, 0, enc.length, dec, 0, n) == n)
        assert(dec.toSeq == structured.toSeq, s"structured n=$n")
      }
      val noise = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val encN = Blosc.blosclzCompress(noise, 0, n)
      if (encN != null) {
        val dec = new Array[Byte](n)
        assert(Blosc.blosclzDecompress(encN, 0, encN.length, dec, 0, n) == n)
        assert(dec.toSeq == noise.toSeq, s"noise n=$n")
      }
    }
  }

  test("wrong expected size and bad stream lengths fail loudly") {
    val f = Blosc.compress(Array.tabulate[Byte](64)(_.toByte), 8, "zlib", shuffle = true)
    val e = intercept[IllegalArgumentException](Blosc.decompress(f, 65))
    assert(e.getMessage.contains("expected 65"))
    // a stream claiming to run past the frame end
    val bad = frame(0x10 | (3 << 5), 1, 32, 32, le32(9999) ++ new Array[Byte](4))
    val e2 = intercept[IllegalArgumentException](Blosc.decompress(bad, 32))
    assert(e2.getMessage.contains("out of range"))
  }

  test("roundtrip: codec × shuffle × size (multi-block, leftover, odd tail)") {
    val rnd = new scala.util.Random(42)
    for {
      cname <- Seq("lz4", "zlib", "zstd")
      shuffle <- Seq(true, false)
      (n, typesize) <- Seq((64, 8), (1000, 4), (4096, 2), (777, 8), (5, 1), (130001, 4))
    } {
      // compressible-but-structured payload: low-entropy high bytes,
      // varying low bytes — exercises both shuffle benefit and the
      // raw-stream fallback
      val data = Array.tabulate[Byte](n)(i => ((i / 13) % 7 + (i % 3) * 40).toByte)
      val f = Blosc.compress(data, typesize, cname, shuffle, blocksize0 = 1024)
      assert(Blosc.decompress(f, n).toSeq == data.toSeq,
        s"roundtrip $cname shuffle=$shuffle n=$n ts=$typesize")
      // and an incompressible payload → memcpy or raw-stream path
      val noise = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val fn = Blosc.compress(noise, typesize, cname, shuffle, blocksize0 = 1024)
      assert(Blosc.decompress(fn, n).toSeq == noise.toSeq,
        s"noise roundtrip $cname shuffle=$shuffle n=$n ts=$typesize")
    }
  }

  test("bitshuffle closed form ≡ the literal reference pipeline; inverse exact") {
    // literal transcription of the published scalar pipeline:
    // bshuf_trans_byte_elem → TRANS_BIT_8X8 over LE u64 groups →
    // bshuf_trans_byte_bitrow, with the N − N % 8 truncation + tail
    def literal(t: Int, src: Array[Byte]): Array[Byte] = {
      val len = src.length
      val n = len / t
      val n8 = n - n % 8
      val nbyte = n8 * t
      val a = new Array[Byte](nbyte)
      for (i <- 0 until n8; tt <- 0 until t) a(tt * n8 + i) = src(i * t + tt)
      val rows = nbyte / 8
      val b = new Array[Byte](nbyte)
      for (g <- 0 until rows) {
        var x = 0L
        for (k <- 0 until 8) x |= (a(8 * g + k) & 0xffL) << (8 * k)
        var tv = (x ^ (x >>> 7)) & 0x00AA00AA00AA00AAL
        x = x ^ tv ^ (tv << 7)
        tv = (x ^ (x >>> 14)) & 0x0000CCCC0000CCCCL
        x = x ^ tv ^ (tv << 14)
        tv = (x ^ (x >>> 28)) & 0x00000000F0F0F0F0L
        x = x ^ tv ^ (tv << 28)
        for (k <- 0 until 8) b(k * rows + g) = ((x >>> (8 * k)) & 0xff).toByte
      }
      val c = new Array[Byte](len)
      val nbyteRow = n8 / 8
      for (ii <- 0 until t; jj <- 0 until 8)
        System.arraycopy(b, (jj * t + ii) * nbyteRow, c, (ii * 8 + jj) * nbyteRow, nbyteRow)
      System.arraycopy(src, n8 * t, c, n8 * t, len - n8 * t)
      c
    }
    val rnd = new scala.util.Random(23)
    for ((n, t) <- Seq((64, 8), (40, 4), (100, 2), (33, 1), (17, 4), (8, 8), (7, 2))) {
      val data = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val fast = Blosc.bitShuffleBytes(t, data, 0, n)
      val ref = literal(t, data)
      assert(fast.toSeq == ref.toSeq, s"closed form diverges at n=$n t=$t")
      val back = new Array[Byte](n)
      Blosc.bitUnshuffle(t, fast, back, 0)
      assert(back.toSeq == data.toSeq, s"inverse at n=$n t=$t")
    }
    // a worked micro-vector: one u16 octet, elements 2^i → byte plane
    // (t=0, b=i) has exactly element i's bit set
    val v = new Array[Byte](16)
    for (i <- 0 until 8) v(2 * i) = (1 << i).toByte // LE u16 = 1 << i
    val sh = Blosc.bitShuffleBytes(2, v, 0, 16)
    for (b <- 0 until 8)
      assert((sh(b) & 0xff) == (1 << b), s"plane (0,$b): ${sh(b)}")
    assert(sh.drop(8).forall(_ == 0))
  }

  test("hand-assembled snappy stream: every tag form decodes exactly") {
    // target: "abcdabcdabcd" + "XY"*40 via
    //  varint(92), literal "abcd", near copy (type 1: len 8, off 4),
    //  literal "XY", 2-byte-offset copy (type 2: len 64, off 2),
    //  4-byte-offset copy (type 3: len 14, off 2)
    val bo = new java.io.ByteArrayOutputStream()
    bo.write(92) // uncompressed length varint
    bo.write(3 << 2); bo.write('a'); bo.write('b'); bo.write('c'); bo.write('d')
    bo.write(((8 - 4) << 2) | 1 | (0 << 5)); bo.write(4) // copy len 8 off 4
    bo.write(1 << 2); bo.write('X'); bo.write('Y')
    bo.write((63 << 2) | 2); bo.write(2); bo.write(0) // copy len 64 off 2
    bo.write((13 << 2) | 3); bo.write(2); bo.write(0); bo.write(0); bo.write(0)
    val stream = bo.toByteArray
    val want = "abcd" * 3 + "XY" * 40
    assert(want.length == 92)
    val dst = new Array[Byte](92)
    assert(Blosc.snappyDecompress(stream, 0, stream.length, dst, 0, 92) == 92)
    assert(new String(dst, "US-ASCII") == want)
    // long literal (61-tag = 1 extra length byte)
    val bo2 = new java.io.ByteArrayOutputStream()
    bo2.write(100); bo2.write(60 << 2); bo2.write(99) // len byte: 99 + 1 = 100
    (0 until 100).foreach(i => bo2.write('a' + i % 26))
    val s2 = bo2.toByteArray
    val d2 = new Array[Byte](100)
    assert(Blosc.snappyDecompress(s2, 0, s2.length, d2, 0, 100) == 100)
    for (i <- 0 until 100) assert(d2(i) == ('a' + i % 26).toByte)
    // malformed: offset underrun + wrong declared length are loud
    val bad = Array[Byte](4, (0 << 2).toByte, 'q', ((4 - 4) << 2 | 1).toByte, 9)
    val e = intercept[IllegalArgumentException](
      Blosc.snappyDecompress(bad, 0, bad.length, new Array[Byte](4), 0, 4))
    assert(e.getMessage.contains("underruns"))
    val e2 = intercept[IllegalArgumentException](
      Blosc.snappyDecompress(stream, 0, stream.length, new Array[Byte](91), 0, 91))
    assert(e2.getMessage.contains("declares"))
  }

  test("snappy encoder↔decoder roundtrip incl. noise") {
    val rnd = new scala.util.Random(17)
    for (n <- Seq(1, 4, 100, 5000, 70000)) {
      val structured = Array.tabulate[Byte](n)(i => ((i / 13) % 7 + (i % 3) * 40).toByte)
      val enc = Blosc.snappyCompress(structured, 0, n)
      if (enc != null) {
        val dec = new Array[Byte](n)
        assert(Blosc.snappyDecompress(enc, 0, enc.length, dec, 0, n) == n)
        assert(dec.toSeq == structured.toSeq, s"structured n=$n")
      }
      val noise = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val encN = Blosc.snappyCompress(noise, 0, n)
      if (encN != null) {
        val dec = new Array[Byte](n)
        assert(Blosc.snappyDecompress(encN, 0, encN.length, dec, 0, n) == n)
        assert(dec.toSeq == noise.toSeq, s"noise n=$n")
      }
    }
  }

  test("bitshuffled blosc frames roundtrip across codecs and odd tails") {
    val rnd = new scala.util.Random(31)
    for {
      cname <- Seq("lz4", "zlib", "blosclz")
      (n, ts) <- Seq((64, 8), (1000, 4), (777, 2), (130001, 4), (50, 1))
    } {
      val data = Array.tabulate[Byte](n)(i => ((i / 11) % 6 + (i % 5) * 20).toByte)
      val f = Blosc.compress(data, ts, cname, shuffle = false,
        blocksize0 = 1024, bitShuffle = true)
      assert(Blosc.decompress(f, n).toSeq == data.toSeq, s"$cname n=$n ts=$ts")
      val noise = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val fn = Blosc.compress(noise, ts, cname, shuffle = false,
        blocksize0 = 1024, bitShuffle = true)
      assert(Blosc.decompress(fn, n).toSeq == noise.toSeq, s"noise $cname n=$n ts=$ts")
    }
  }

  test("shuffle/unshuffle are exact inverses incl. non-multiple tails") {
    val rnd = new scala.util.Random(7)
    for ((n, ts) <- Seq((24, 8), (25, 8), (31, 4), (7, 2), (9, 16))) {
      val data = Array.fill[Byte](n)(rnd.nextInt().toByte)
      val sh = Blosc.shuffleBytes(ts, data, 0, n)
      val out = new Array[Byte](n)
      Blosc.unshuffle(ts, sh, out, 0)
      assert(out.toSeq == data.toSeq, s"n=$n ts=$ts")
    }
  }
}
