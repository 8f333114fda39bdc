package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.zonal.Lookup3

/** lookup3 `hashlittle` against the reference implementation's own
  * published vectors (lookup3.c driver comments), plus structural
  * properties.
  */
class Lookup3Spec extends AnyFunSuite {

  test("reference vectors") {
    assert(Lookup3.hash(Array.emptyByteArray, 0, 0, 0) == 0xdeadbeef)
    val four = "Four score and seven years ago".getBytes("US-ASCII")
    assert(Lookup3.hash(four, 0, four.length, 0) == 0x17770551)
    assert(Lookup3.hash(four, 0, four.length, 1) == 0xcd628161)
  }

  test("length sensitivity and offset independence") {
    val b = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    // every length hashes differently from its neighbors (overwhelming
    // probability for a real mixer) and offsets slice correctly
    val hs = (0 to 64).map(n => Lookup3.hash(b, 0, n, 0))
    assert(hs.distinct.size == hs.size)
    assert(Lookup3.hash(b, 16, 12, 0) ==
      Lookup3.hash(java.util.Arrays.copyOfRange(b, 16, 28), 0, 12, 0))
  }
}
