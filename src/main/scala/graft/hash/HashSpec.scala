package graft.hash

/** The v1 hash-string and block-size grammar.
  *
  * String form: `v1-<algo_lowercased>-<blocksize_as_given>-<hexdigest>`
  * (reference build: /root/reference/dirhash.py:250-253, parse: 256-274).
  * Block size: integer 1..1023 with optional k/K/M/G suffix
  * (/root/reference/dirhash.py:223-248) — `1024` is invalid but `1023G` is
  * the maximum, exactly as the reference bounds it.
  */
object HashSpec {

  private val BlocksizeRe = """(\d+)([kKMG]?)""".r
  private val HexRe = """[0-9a-fA-F]+""".r
  val MaxBlockSizeInt = 1024
  val DefaultBlockSize = "128M"

  /** Parsed hash string: version is always "v1". `blockSize` is the parsed
    * byte count; `blockSizeStr` preserves the user's original spelling (the
    * reference keeps the un-normalized string in the hash string).
    */
  final case class HashString(algo: String, blockSizeStr: String, hexDigest: String) {
    val blockSize: Long = parseBlockSize(blockSizeStr)
    override def toString: String = buildHashString(algo, blockSizeStr, hexDigest)
  }

  def suffixFactor(suffix: String): Long = suffix match {
    case ""        => 1L
    case "k" | "K" => 1024L
    case "M"       => 1024L * 1024
    case "G"       => 1024L * 1024 * 1024
    case s => throw new IllegalArgumentException(s"""Unknown block size suffix: "$s"""")
  }

  /** @throws IllegalArgumentException on malformed or out-of-range input
    *         (clean error where the reference leaks an AttributeError on a
    *         regex miss — SURVEY.md §1.2 notes this as a deliberate fix)
    */
  def parseBlockSize(s: String): Long = s match {
    case BlocksizeRe(digits, suffix) =>
      val i = BigInt(digits)
      if (i <= 0 || i >= MaxBlockSizeInt)
        throw new IllegalArgumentException(
          s"Integer in block size $s out of range. (Must be between 0 and $MaxBlockSizeInt.)")
      i.toLong * suffixFactor(suffix)
    case _ =>
      throw new IllegalArgumentException(s"""malformed block size: "$s"""")
  }

  def buildHashString(algo: String, blockSizeStr: String, hexDigest: String): String = {
    require(Algos.supported.contains(algo), s"unsupported algorithm: $algo")
    parseBlockSize(blockSizeStr) // validates; throws if malformed
    Seq("v1", algo.toLowerCase, blockSizeStr, hexDigest).mkString("-")
  }

  /** @throws IllegalArgumentException on bad version/algo/blocksize/hex */
  def parseHashString(s: String): HashString = s.split("-", -1) match {
    case Array(version, algo, blockSizeStr, hexDigest) =>
      if (version != "v1")
        throw new IllegalArgumentException(s"""unknown hash value version: "$version"""")
      Algos.get(algo) // raises if the algorithm is unknown
      if (!HexRe.pattern.matcher(hexDigest).matches())
        throw new IllegalArgumentException(s"""malformed hash value: "$hexDigest"""")
      val hs = HashString(algo, blockSizeStr, hexDigest) // validates blocksize
      hs
    case _ =>
      throw new IllegalArgumentException(s"""malformed hash string: "$s"""")
  }
}
