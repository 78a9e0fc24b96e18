package graft

/** Fixture-content pins shared by the round specs (round-12 review:
  * the hash lived in two files, so a re-pin applied to one would leave
  * the other suite's exact assertions silently skipped forever).
  */
object TestFixtures {

  /** Content hash of the sf0.01 embeddings fixture the exact pinned
    * operating curves (q271/q277/q293/q294/q295) were measured on.
    */
  val pinnedEmbeddingsMd5 = "4232d4b317b4b9f35bd5a6abf25d0ade"

  def embeddingsMd5(dir: String): String = {
    val bytes = java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/embeddings.parquet"))
    java.security.MessageDigest.getInstance("MD5").digest(bytes)
      .map("%02x".format(_)).mkString
  }
}
