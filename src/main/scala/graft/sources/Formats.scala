package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructType}

/** Ingest-format hardening beyond the happy-path round-trips
  * (SourcesSpec): real crawl dumps arrive as JSONL with a tail of
  * malformed lines (truncated writes, encoding damage, stray logging),
  * and a 100-TB ingest must QUARANTINE those rows — not fail the job
  * (FAILFAST) and not silently null them into the corpus (DROPMALFORMED
  * loses the evidence). PERMISSIVE mode with a corrupt-record column
  * keeps every byte: clean rows parse into the schema, damaged lines
  * land intact in the quarantine column for a repair/re-crawl queue.
  */
object Formats {

  val CorruptCol = "_corrupt_record"

  /** Read schema-conforming JSONL with malformed lines captured in
    * [[CorruptCol]] instead of dropped or fatal. Spark requires the
    * corrupt column to appear in the declared schema; callers split the
    * result with [[splitQuarantine]].
    */
  def readJsonlQuarantined(spark: SparkSession, path: String,
      schema: StructType): DataFrame =
    spark.read
      .schema(schema.add(CorruptCol, StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .json(path)

  /** (clean rows with the contract schema, quarantined raw lines,
    * release handle). The parsed frame is cached before splitting:
    * Spark's JSON parser populates the corrupt column lazily, and the
    * documented pattern (filter on it straight off the scan) otherwise
    * throws AnalysisException on referencing the corrupt column alone.
    * Callers MUST invoke the release handle once both sides are
    * consumed — a per-batch ingest that never releases pins every
    * batch's parse in storage memory (the keeperShingleIntersections
    * contract, same shape).
    */
  def splitQuarantine(parsed: DataFrame): (DataFrame, DataFrame, () => Unit) = {
    val cached = parsed.cache()
    val clean = cached.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val quarantine = cached.filter(col(CorruptCol).isNotNull)
      .select(col(CorruptCol).as("raw_line"))
    (clean, quarantine, () => { cached.unpersist(); () })
  }
}
