package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

import graft.functions.{ChunkHashOps, TextOps, VectorOps}

/** Session-extension entry point: registers the engine's codegen'd
  * Catalyst expressions (vec_dot, vec_norm, bigram_counts, chunk_hash)
  * at session build time, so a cluster deployment enables them with
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * (or `.withExtensions(new GraftExtensions)` on the builder) and every
  * session — including ones the library never sees — can call them from
  * SQL. The per-object `register(spark)` helpers remain for sessions
  * created without the conf; both routes build the identical expressions.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) =
      new ExpressionInfo("graft", null, name, usage, "")

    ext.injectFunction((FunctionIdentifier("vec_dot"),
      info("vec_dot", "vec_dot(a, b) - dot product over array<float|double>, double accumulator"),
      exprs => VectorOps.VecDot(exprs(0), exprs(1))))
    ext.injectFunction((FunctionIdentifier("vec_norm"),
      info("vec_norm", "vec_norm(a) - L2 norm over array<float|double>"),
      exprs => VectorOps.VecNorm(exprs.head)))
    ext.injectFunction((FunctionIdentifier("bigram_counts"),
      info("bigram_counts", "bigram_counts(text) - map<bigram, count> of character bigrams"),
      exprs => TextOps.BigramCounts(exprs.head)))
    ext.injectFunction((FunctionIdentifier("feature_hash"),
      info("feature_hash", "feature_hash(text) - 64-dim hashing-trick token count vector"),
      exprs => TextOps.FeatureHash(exprs.head, 64)))
    ext.injectFunction((FunctionIdentifier("simhash32"),
      info("simhash32", "simhash32(text) - 32-bit SimHash over whitespace tokens"),
      exprs => TextOps.SimHash32(exprs.head)))
    ext.injectFunction((FunctionIdentifier("chunk_hash"),
      info("chunk_hash", "chunk_hash(path, idx, content, algo) - domain-separated chunk digest"),
      exprs => ChunkHashOps.ChunkHash(exprs(0), exprs(1), exprs(2), exprs(3))))
    // the gram/char expressions take the literal-only length argument;
    // TextOps.litInt is the one shared extractor, so both deployment
    // routes reject a non-literal identically
    import graft.functions.TextOps.litInt
    ext.injectFunction((FunctionIdentifier("gram_hashes"),
      info("gram_hashes", "gram_hashes(text, n) - xxhash64 of every word n-gram, document order"),
      exprs => TextOps.GramHashes(exprs.head, litInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("distinct_grams"),
      info("distinct_grams", "distinct_grams(text, n) - per-doc distinct word n-gram strings"),
      exprs => TextOps.DistinctGrams(exprs.head, litInt(exprs(1)))))
    ext.injectFunction((FunctionIdentifier("char_counts"),
      info("char_counts", "char_counts(text) - map<char, count> in char-code order"),
      exprs => TextOps.CharCounts(exprs.head)))
    ext.injectFunction((FunctionIdentifier("cdc_cuts"),
      info("cdc_cuts", "cdc_cuts(text, window, modulus) - rolling-hash CDC cut positions"),
      exprs => TextOps.CdcCuts(exprs.head, litInt(exprs(1)), litInt(exprs(2)))))
    ext.injectFunction((FunctionIdentifier("cdc_cut_hashes"),
      info("cdc_cut_hashes", "cdc_cut_hashes(text, window) - mod-16 CDC cuts with h%64 for nested-moduli sweeps"),
      exprs => TextOps.CdcCutHashes(exprs.head, litInt(exprs(1)))))
    // bloom sketch surface: Spark's own runtime-filter expressions under
    // stable SQL names (see graft.functions.SketchOps)
    ext.injectFunction((FunctionIdentifier("bloom_agg"),
      info("bloom_agg", "bloom_agg(xxhash64(key), est_items, num_bits) - serialized bloom filter"),
      exprs => new org.apache.spark.sql.catalyst.expressions.aggregate
        .BloomFilterAggregate(exprs(0), exprs(1), exprs(2))))
    ext.injectFunction((FunctionIdentifier("bloom_contains"),
      info("bloom_contains", "bloom_contains(bf, xxhash64(key)) - bloom membership probe"),
      exprs => org.apache.spark.sql.catalyst.expressions
        .BloomFilterMightContain(exprs(0), exprs(1))))
  }
}
