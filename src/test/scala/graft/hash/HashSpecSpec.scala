package graft.hash

import org.scalatest.funsuite.AnyFunSuite

/** Block-size grammar and v1 hash-string round trips (reference
  * /root/reference/dirhash.py:223-274; bounds noted in SURVEY.md §1.2).
  */
class HashSpecSpec extends AnyFunSuite {

  test("block size grammar: suffix factors and bounds") {
    assert(HashSpec.parseBlockSize("1") == 1L)
    assert(HashSpec.parseBlockSize("1023") == 1023L)
    assert(HashSpec.parseBlockSize("1k") == 1024L)
    assert(HashSpec.parseBlockSize("1K") == 1024L)
    assert(HashSpec.parseBlockSize("128M") == 128L * 1024 * 1024)
    assert(HashSpec.parseBlockSize("32M") == 32L * 1024 * 1024)
    assert(HashSpec.parseBlockSize("1023G") == 1023L * 1024 * 1024 * 1024)
    // "1024" is invalid but "1023G" is the max — the reference's exact bound
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("1024"))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("0"))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("-1"))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("12T"))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("abc"))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize(""))
    assertThrows[IllegalArgumentException](HashSpec.parseBlockSize("1 M"))
  }

  test("hash string build: algo lower-cased, blocksize string preserved") {
    val hex = "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855"
    assert(HashSpec.buildHashString("SHA256", "32M", hex) == s"v1-sha256-32M-$hex")
    assert(HashSpec.buildHashString("sha256", "512", hex) == s"v1-sha256-512-$hex")
    assertThrows[IllegalArgumentException](HashSpec.buildHashString("md5", "32M", hex))
    assertThrows[IllegalArgumentException](HashSpec.buildHashString("sha256", "1024", hex))
  }

  test("hash string parse: validates version, algo, blocksize, hex") {
    val hex = "abcDEF0123456789"
    val hs = HashSpec.parseHashString(s"v1-sha256-128M-$hex")
    assert(hs.algo == "sha256")
    assert(hs.blockSizeStr == "128M")
    assert(hs.blockSize == 128L * 1024 * 1024)
    assert(hs.hexDigest == hex)
    assert(hs.toString == s"v1-sha256-128M-$hex")

    assertThrows[IllegalArgumentException](HashSpec.parseHashString(s"v2-sha256-128M-$hex"))
    assertThrows[IllegalArgumentException](HashSpec.parseHashString(s"v1-md5-128M-$hex"))
    assertThrows[IllegalArgumentException](HashSpec.parseHashString(s"v1-sha256-1024-$hex"))
    assertThrows[IllegalArgumentException](HashSpec.parseHashString("v1-sha256-128M-zzz"))
    assertThrows[IllegalArgumentException](HashSpec.parseHashString("v1-sha256-128M"))
    assertThrows[IllegalArgumentException](HashSpec.parseHashString(s"v1-sha256-128M-$hex-extra"))
  }
}
