package graft.hash

import org.scalatest.funsuite.AnyFunSuite

/** Known-answer tests for every whitelisted algorithm (reference
  * HashFunctionsTest, /root/reference/dirhash_test.py:372-601): digest of
  * "" and of "abcdefghijklmnopqrstuvwxyz" against published constants,
  * plus rejection of md5/sha1/garbage.
  */
class AlgosSpec extends AnyFunSuite {

  private val AZ = "abcdefghijklmnopqrstuvwxyz"

  private def hexOf(algo: String, s: String): String = {
    val d = Algos.get(algo)
    d.update(s)
    Algos.hex(d.digest())
  }

  // (algo, H(""), H("abcdefghijklmnopqrstuvwxyz"))
  private val vectors = Seq(
    ("sha224",
      "d14a028c2a3a2bc9476102bb288234c415a2b01f828ea62ac5b3e42f",
      "45a5f72c39c5cff2522eb3429799e49e5f44b356ef926bcf390dccc2"),
    ("sha256",
      "e3b0c44298fc1c149afbf4c8996fb92427ae41e4649b934ca495991b7852b855",
      "71c480df93d6ae2f1efad1447c66c9525e316218cf51fc8d9ed832f2daf18b73"),
    ("sha384",
      "38b060a751ac96384cd9327eb1b1e36a21fdb71114be07434c0cc7bf63f6e1da274edebfe76f65fbd51ad2f14898b95b",
      "feb67349df3db6f5924815d6c3dc133f091809213731fe5c7b5f4999e463479ff2877f5f2936fa63bb43784b12f3ebb4"),
    ("sha512",
      "cf83e1357eefb8bdf1542850d66d8007d620e4050b5715dc83f4a921d36ce9ce47d0d13c5d85f2b0ff8318d2877eec2f63b931bd47417a81a538327af927da3e",
      "4dbff86cc2ca1bae1e16468a05cb9881c97f1753bce3619034898faa1aabe429955a1bf8ec483d7421fe3c1646613a59ed5441fb0f321389f77f48a879c7b1f1"),
    ("sha3_224",
      "6b4e03423667dbb73b6e15454f0eb1abd4597f9a1b078e3f5b5a6bc7",
      "5cdeca81e123f87cad96b9cba999f16f6d41549608d4e0f4681b8239"),
    ("sha3_256",
      "a7ffc6f8bf1ed76651c14756a061d662f580ff4de43b49fa82d80a4b80f8434a",
      "7cab2dc765e21b241dbc1c255ce620b29f527c6d5e7f5f843e56288f0d707521"),
    ("sha3_384",
      "0c63a75b845e4f7d01107d852e4c2485c51a50aaaa94fc61995e71bbee983a2ac3713831264adb47fb6bd1e058d5f004",
      "fed399d2217aaf4c717ad0c5102c15589e1c990cc2b9a5029056a7f7485888d6ab65db2370077a5cadb53fc9280d278f"),
    ("sha3_512",
      "a69f73cca23a9ac5c8b567dc185a756e97c982164fe25859e0d1dcc1475c80a615b2123af1f5f94c11e3e9402c3ac558f500199d95b6d3e301758586281dcd26",
      "af328d17fa28753a3c9f5cb72e376b90440b96f0289e5703b729324a975ab384eda565fc92aaded143669900d761861687acdc0a5ffa358bd0571aaad80aca68"),
    ("blake2b",
      "786a02f742015903c6c6fd852552d272912f4740e15847618a86e217f71f5419d25e1031afee585313896444934eb04b903a685b1448b755d56f701afe9be2ce",
      "c68ede143e416eb7b4aaae0d8e48e55dd529eafed10b1df1a61416953a2b0a5666c761e7d412e6709e31ffe221b7a7a73908cb95a4d120b8b090a87d1fbedb4c"),
    ("blake2s",
      "69217a3079908094e11121d042354a7c1f55b6482ca1a51e1b250dfd1ed0eef9",
      "bdf88eb1f86a0cdf0e840ba88fa118508369df186c7355b4b16cf79fa2710a12"),
  )

  vectors.foreach { case (algo, emptyHex, azHex) =>
    test(s"$algo empty-string and a-z golden vectors") {
      assert(hexOf(algo, "") == emptyHex)
      assert(hexOf(algo, AZ) == azHex)
    }
  }

  test("SHA-2 names accepted upper- and lower-case; others lower-only") {
    Seq("SHA224", "SHA256", "SHA384", "SHA512").foreach { n =>
      assert(Algos.supported.contains(n))
      assert(Algos.hex(Algos.get(n).digest()) ==
        Algos.hex(Algos.get(n.toLowerCase).digest()))
    }
    Seq("SHA3_256", "BLAKE2B").foreach { n =>
      assertThrows[IllegalArgumentException](Algos.get(n))
    }
  }

  test("weak/unknown algorithms rejected (md5, sha1, garbage)") {
    Seq("md5", "MD5", "sha1", "SHA1", "sha", "SHA", "abcdef").foreach { n =>
      assertThrows[IllegalArgumentException](Algos.get(n))
    }
  }

  test("Blake2 multi-block golden vectors (exact block and spanning blocks)") {
    val p = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    def hexBytes(algo: String, bytes: Array[Byte]): String = {
      val d = Algos.get(algo); d.update(bytes); Algos.hex(d.digest())
    }
    assert(hexBytes("blake2b", p) ==
      "c11e1c0340bd7e5a1b275f1230c962fad215ecb1391486e74e31b960a2f2996381a5fad092da06841d5f26e38f6ecfeaf441acbcd1c2de61aef121e7927175f5")
    assert(hexBytes("blake2s", p) ==
      "1c067a5e746fb0f6734efac9a8cdb0e11061f0077f255184365c690115392501")
    // exactly one full block (the last-block flag path)
    assert(hexBytes("blake2b", p.take(128)) ==
      "2319e3789c47e2daa5fe807f61bec2a1a6537fa03f19ff32e87eecbfd64b7e0e8ccff439ac333b040f19b0c4ddd11a61e24ac1fe0f10a039806c5dcc0da3d115")
    assert(hexBytes("blake2s", p.take(64)) ==
      "56f34e8b96557e90c1f24b52d0c89d51086acf1b00f634cf1dde9233b8eaaa3e")
  }

  test("incremental update equals one-shot (multi-block boundary)") {
    // exercises Blake2 buffering across block boundaries (128/64 B blocks)
    val payload = Array.tabulate[Byte](1000)(i => (i % 251).toByte)
    Seq("blake2b", "blake2s", "sha256").foreach { algo =>
      val oneShot = Algos.get(algo)
      oneShot.update(payload)
      val chunked = Algos.get(algo)
      payload.grouped(37).foreach(chunked.update(_))
      assert(Algos.hex(oneShot.digest()) == Algos.hex(chunked.digest()), algo)
    }
  }
}
