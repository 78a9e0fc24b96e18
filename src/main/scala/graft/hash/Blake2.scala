package graft.hash

/** Pure-Scala BLAKE2b / BLAKE2s (unkeyed, sequential) per RFC 7693.
  *
  * Present because the reference's algorithm whitelist includes blake2b /
  * blake2s (/root/reference/dirhash.py:157-171) and JDK 17 ships no BLAKE2
  * provider. Implemented from the public RFC; validated against the
  * RFC/hashlib test vectors in AlgosSpec.
  */
private[hash] final class Blake2b(digestLength: Int = 64) extends Digest {
  require(digestLength >= 1 && digestLength <= 64)

  private val IV = Array[Long](
    0x6a09e667f3bcc908L, 0xbb67ae8584caa73bL, 0x3c6ef372fe94f82bL,
    0xa54ff53a5f1d36f1L, 0x510e527fade682d1L, 0x9b05688c2b3e6c1fL,
    0x1f83d9abfb41bd6bL, 0x5be0cd19137e2179L)

  private val SIGMA = Blake2.SIGMA

  private val h = IV.clone()
  h(0) ^= 0x01010000L ^ digestLength.toLong
  private val buf = new Array[Byte](128)
  private var bufLen = 0
  private var t0 = 0L // low 64 bits of byte counter (inputs < 2^64 here)

  private def rotr64(x: Long, n: Int): Long = (x >>> n) | (x << (64 - n))

  private def g(v: Array[Long], a: Int, b: Int, c: Int, d: Int, x: Long, y: Long): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr64(v(d) ^ v(a), 32)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 24)
    v(a) = v(a) + v(b) + y
    v(d) = rotr64(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr64(v(b) ^ v(c), 63)
  }

  private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
    val m = new Array[Long](16)
    var i = 0
    while (i < 16) {
      var w = 0L
      var j = 7
      while (j >= 0) { w = (w << 8) | (block(off + i * 8 + j) & 0xffL); j -= 1 }
      m(i) = w
      i += 1
    }
    val v = new Array[Long](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t0
    // t1 (high counter word) stays 0 for < 2^64 input bytes
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 12) {
      val s = SIGMA(r % 10)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  def update(bytes: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var remaining = len
    while (remaining > 0) {
      if (bufLen == 128) { // buffer full AND more input coming -> not last
        t0 += 128
        compress(buf, 0, last = false)
        bufLen = 0
      }
      val n = math.min(128 - bufLen, remaining)
      System.arraycopy(bytes, o, buf, bufLen, n)
      bufLen += n; o += n; remaining -= n
    }
  }

  def digest(): Array[Byte] = {
    t0 += bufLen
    java.util.Arrays.fill(buf, bufLen, 128, 0.toByte)
    compress(buf, 0, last = true)
    val out = new Array[Byte](digestLength)
    var i = 0
    while (i < digestLength) {
      out(i) = ((h(i / 8) >>> (8 * (i % 8))) & 0xff).toByte
      i += 1
    }
    out
  }
}

private[hash] final class Blake2s(digestLength: Int = 32) extends Digest {
  require(digestLength >= 1 && digestLength <= 32)

  private val IV = Array[Int](
    0x6a09e667, 0xbb67ae85, 0x3c6ef372, 0xa54ff53a,
    0x510e527f, 0x9b05688c, 0x1f83d9ab, 0x5be0cd19)

  private val SIGMA = Blake2.SIGMA

  private val h = IV.clone()
  h(0) ^= 0x01010000 ^ digestLength
  private val buf = new Array[Byte](64)
  private var bufLen = 0
  private var t0 = 0L

  private def rotr32(x: Int, n: Int): Int = (x >>> n) | (x << (32 - n))

  private def g(v: Array[Int], a: Int, b: Int, c: Int, d: Int, x: Int, y: Int): Unit = {
    v(a) = v(a) + v(b) + x
    v(d) = rotr32(v(d) ^ v(a), 16)
    v(c) = v(c) + v(d)
    v(b) = rotr32(v(b) ^ v(c), 12)
    v(a) = v(a) + v(b) + y
    v(d) = rotr32(v(d) ^ v(a), 8)
    v(c) = v(c) + v(d)
    v(b) = rotr32(v(b) ^ v(c), 7)
  }

  private def compress(block: Array[Byte], off: Int, last: Boolean): Unit = {
    val m = new Array[Int](16)
    var i = 0
    while (i < 16) {
      m(i) = (block(off + i * 4) & 0xff) |
        ((block(off + i * 4 + 1) & 0xff) << 8) |
        ((block(off + i * 4 + 2) & 0xff) << 16) |
        ((block(off + i * 4 + 3) & 0xff) << 24)
      i += 1
    }
    val v = new Array[Int](16)
    System.arraycopy(h, 0, v, 0, 8)
    System.arraycopy(IV, 0, v, 8, 8)
    v(12) ^= t0.toInt
    v(13) ^= (t0 >>> 32).toInt
    if (last) v(14) = ~v(14)
    var r = 0
    while (r < 10) {
      val s = SIGMA(r)
      g(v, 0, 4, 8, 12, m(s(0)), m(s(1)))
      g(v, 1, 5, 9, 13, m(s(2)), m(s(3)))
      g(v, 2, 6, 10, 14, m(s(4)), m(s(5)))
      g(v, 3, 7, 11, 15, m(s(6)), m(s(7)))
      g(v, 0, 5, 10, 15, m(s(8)), m(s(9)))
      g(v, 1, 6, 11, 12, m(s(10)), m(s(11)))
      g(v, 2, 7, 8, 13, m(s(12)), m(s(13)))
      g(v, 3, 4, 9, 14, m(s(14)), m(s(15)))
      r += 1
    }
    i = 0
    while (i < 8) { h(i) ^= v(i) ^ v(i + 8); i += 1 }
  }

  def update(bytes: Array[Byte], off: Int, len: Int): Unit = {
    var o = off
    var remaining = len
    while (remaining > 0) {
      if (bufLen == 64) {
        t0 += 64
        compress(buf, 0, last = false)
        bufLen = 0
      }
      val n = math.min(64 - bufLen, remaining)
      System.arraycopy(bytes, o, buf, bufLen, n)
      bufLen += n; o += n; remaining -= n
    }
  }

  def digest(): Array[Byte] = {
    t0 += bufLen
    java.util.Arrays.fill(buf, bufLen, 64, 0.toByte)
    compress(buf, 0, last = true)
    val out = new Array[Byte](digestLength)
    var i = 0
    while (i < digestLength) {
      out(i) = ((h(i / 4) >>> (8 * (i % 4))) & 0xff).toByte
      i += 1
    }
    out
  }
}

private[hash] object Blake2 {
  /** Message word schedule, shared by both variants (RFC 7693 §2.7). */
  val SIGMA: Array[Array[Int]] = Array(
    Array(0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15),
    Array(14, 10, 4, 8, 9, 15, 13, 6, 1, 12, 0, 2, 11, 7, 5, 3),
    Array(11, 8, 12, 0, 5, 2, 15, 13, 10, 14, 3, 6, 7, 1, 9, 4),
    Array(7, 9, 3, 1, 13, 12, 11, 14, 2, 6, 5, 10, 4, 0, 15, 8),
    Array(9, 0, 5, 7, 2, 4, 10, 15, 14, 1, 11, 12, 6, 8, 3, 13),
    Array(2, 12, 6, 10, 0, 11, 8, 3, 4, 13, 7, 5, 15, 14, 1, 9),
    Array(12, 5, 1, 15, 14, 13, 4, 10, 0, 7, 6, 3, 9, 2, 8, 11),
    Array(13, 11, 7, 14, 12, 1, 3, 9, 5, 0, 15, 4, 8, 6, 2, 10),
    Array(6, 15, 14, 9, 11, 3, 0, 8, 12, 2, 13, 7, 1, 4, 10, 5),
    Array(10, 2, 8, 4, 7, 6, 1, 5, 15, 11, 9, 14, 3, 12, 13, 0))
}
