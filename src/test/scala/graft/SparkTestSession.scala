package graft

import org.apache.spark.sql.SparkSession

/** One lazily-created local session shared by every suite in the JVM
  * (Test / fork := true, so it dies with the test JVM).
  */
object SparkTestSession {
  lazy val spark: SparkSession = {
    // drift witness for graft.Bench: benches taken soon after a test
    // suite run are page-cache-churn inflated, and the bench records the
    // age of this marker so the regime is visible in the artifact
    try java.nio.file.Files.writeString(
      java.nio.file.Paths.get("/tmp/graft_last_suite_run"),
      java.time.Instant.now.toString)
    catch { case _: Throwable => () }
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
