package graft.zonal

/** Bob Jenkins' lookup3 `hashlittle` (public domain, the checksum HDF5
  * uses for every v2-era metadata block: OHDR, superblock v3, fixed
  * arrays). Implemented from the published algorithm: 12-byte blocks
  * mixed through the 6-step rotate schedule, the final partial block
  * through the 7-step `final` schedule, initial state
  * 0xdeadbeef + len + seed.
  */
object Lookup3 {

  @inline private def rot(x: Int, k: Int): Int = (x << k) | (x >>> (32 - k))

  /** hashlittle(key, seed) over a byte range. */
  def hash(key: Array[Byte], off: Int, len: Int, seed: Int = 0): Int = {
    var a = 0xdeadbeef + len + seed
    var b = a
    var c = a
    var i = off
    var remaining = len
    @inline def u8(p: Int): Int = key(p) & 0xff
    while (remaining > 12) {
      a += u8(i) + (u8(i + 1) << 8) + (u8(i + 2) << 16) + (u8(i + 3) << 24)
      b += u8(i + 4) + (u8(i + 5) << 8) + (u8(i + 6) << 16) + (u8(i + 7) << 24)
      c += u8(i + 8) + (u8(i + 9) << 8) + (u8(i + 10) << 16) + (u8(i + 11) << 24)
      // mix
      a -= c; a ^= rot(c, 4); c += b
      b -= a; b ^= rot(a, 6); a += c
      c -= b; c ^= rot(b, 8); b += a
      a -= c; a ^= rot(c, 16); c += b
      b -= a; b ^= rot(a, 19); a += c
      c -= b; c ^= rot(b, 4); b += a
      i += 12
      remaining -= 12
    }
    // last block (1..12 bytes remain for any len > 0): affect all of
    // (a, b, c), then the final mix; zero-length input returns the
    // initial state per the reference
    if (len == 0) return c
    if (remaining >= 12) { // remaining == 12
      a += u8(i) + (u8(i + 1) << 8) + (u8(i + 2) << 16) + (u8(i + 3) << 24)
      b += u8(i + 4) + (u8(i + 5) << 8) + (u8(i + 6) << 16) + (u8(i + 7) << 24)
      c += u8(i + 8) + (u8(i + 9) << 8) + (u8(i + 10) << 16) + (u8(i + 11) << 24)
    } else {
      if (remaining >= 1) a += u8(i)
      if (remaining >= 2) a += u8(i + 1) << 8
      if (remaining >= 3) a += u8(i + 2) << 16
      if (remaining >= 4) a += u8(i + 3) << 24
      if (remaining >= 5) b += u8(i + 4)
      if (remaining >= 6) b += u8(i + 5) << 8
      if (remaining >= 7) b += u8(i + 6) << 16
      if (remaining >= 8) b += u8(i + 7) << 24
      if (remaining >= 9) c += u8(i + 8)
      if (remaining >= 10) c += u8(i + 9) << 8
      if (remaining >= 11) c += u8(i + 10) << 16
    }
    // final(a, b, c)
    c ^= b; c -= rot(b, 14)
    a ^= c; a -= rot(c, 11)
    b ^= a; b -= rot(a, 25)
    c ^= b; c -= rot(b, 16)
    a ^= c; a -= rot(c, 4)
    b ^= a; b -= rot(a, 14)
    c ^= b; c -= rot(b, 24)
    c
  }

  def hash(key: Array[Byte]): Int = hash(key, 0, key.length, 0)
}
