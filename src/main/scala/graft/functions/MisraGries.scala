package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Misra–Gries heavy-hitters summary as a typed [[Aggregator]] — the
  * deterministic frequency sketch: capacity-k state, one pass, O(k)
  * memory per partial. Complements q147's count-min sketch (randomized,
  * fixed-width, overcounts) with the classic UNDERcounting summary:
  * stored(x) ≤ true(x) ≤ stored(x) + n/(k+1), and any item with
  * true(x) > n/(k+1) is guaranteed present.
  *
  * Distribution shape: Spark folds one capacity-k map per partition
  * (partial aggregation), then merges the ≤#partitions summaries with
  * the Agarwal et al. mergeable-summaries rule — combine counts, then
  * subtract the (k+1)-th largest and drop non-positives — which
  * preserves the n/(k+1) error bound. Constant-size state regardless of
  * corpus size: THE property that lets a 100 TB frequency pass run
  * without shuffling the vocabulary.
  */
object MisraGries {

  type Summary = Map[String, Long]

  private[functions] def reduceOne(b: Summary, tok: String, k: Int): Summary = {
    val c = b.getOrElse(tok, 0L)
    if (c > 0 || b.size < k) b.updated(tok, c + 1L)
    else b.flatMap { case (t, n) =>
      if (n > 1L) Some(t -> (n - 1L)) else None
    }
  }

  private[functions] def mergeTwo(b1: Summary, b2: Summary, k: Int): Summary = {
    val m = b2.foldLeft(b1) { case (acc, (t, n)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + n)
    }
    if (m.size <= k) m
    else {
      // (k+1)-th largest stored count; subtracting it everywhere keeps
      // at most k positives and preserves the summed error bound
      val cut = m.values.toIndexedSeq.sorted(Ordering[Long].reverse)(k)
      m.flatMap { case (t, n) =>
        if (n > cut) Some(t -> (n - cut)) else None
      }
    }
  }

  private class MGAggregator(k: Int)
      extends Aggregator[String, Summary, Summary] {
    override def zero: Summary = Map.empty
    override def reduce(b: Summary, a: String): Summary =
      if (a == null) b else reduceOne(b, a, k)
    override def merge(b1: Summary, b2: Summary): Summary =
      mergeTwo(b1, b2, k)
    override def finish(r: Summary): Summary = r
    override def bufferEncoder: ExpressionEncoder[Summary] =
      ExpressionEncoder[Summary]()
    override def outputEncoder: ExpressionEncoder[Summary] =
      ExpressionEncoder[Summary]()
  }

  /** Column aggregate: `mgSummary(k)(tokenCol)` → map<token, stored>. */
  def mgSummary(k: Int): Column => Column = {
    val f = udaf(new MGAggregator(k), ExpressionEncoder[String]())
    (c: Column) => f(c)
  }
}
