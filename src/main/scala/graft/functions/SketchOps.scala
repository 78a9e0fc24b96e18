package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL-surface names for Spark's own bloom-filter sketch expressions
  * (the machinery behind AQE runtime filtering, not exposed through
  * `functions._`):
  *
  *   - `bloom_agg(xxhash64(key), est_items, num_bits)` — aggregate a
  *     key set into a serialized bloom filter (binary).
  *   - `bloom_contains(bf, xxhash64(key))` — membership probe; the
  *     filter argument must be foldable (a literal), which is exactly
  *     how [[graft.ops.Relational.bloomPrune]] uses it: build the
  *     sketch with one aggregate, ship the KB-sized bytes back as a
  *     literal, and let every scan task probe it with zero shuffle.
  *
  * This is the explicit form of what `InjectRuntimeFilter` does
  * implicitly for shuffle joins: pay a tiny sketch to skip the bulk of
  * a 100-TB probe side before the join shuffle. Registering the
  * built-in expressions (rather than re-implementing the sketch) keeps
  * the on-wire format identical to Spark's own runtime filters.
  */
object SketchOps {

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "bloom_agg",
      exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
      "built-in")
    reg.createOrReplaceTempFunction(
      "bloom_contains",
      exprs => BloomFilterMightContain(exprs(0), exprs(1)),
      "built-in")
  }
}
