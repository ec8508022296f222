package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed, mergeable custom aggregate — the `Aggregator` API surface the
  * engine exposes beside its native Catalyst expressions (see
  * [[VectorExpressions]]): exact top-2 DISTINCT maxima per group with
  * one combined state. The state is two longs, the merge is four
  * comparisons — associative and commutative, so Spark runs it as a
  * partial aggregate on every executor and merges partials on the
  * shuffle-reduced side, exactly like a built-in (register with
  * `functions.udaf(TopTwoAggregator)` / `spark.udf.register`).
  *
  * Reference rationale: the reference's detectors publish "the worst
  * offender" per window (spark_streaming.py:155-239); top-2 is the same
  * readout with a runner-up for tie-break context, kept exact and
  * mergeable at any parallelism.
  */
object TopTwoAggregator extends Aggregator[Long, (Long, Long), (Long, Long)] {

  private val Neg = Long.MinValue

  /** (best, second-best distinct) — MinValue marks "absent". */
  override def zero: (Long, Long) = (Neg, Neg)

  override def reduce(b: (Long, Long), x: Long): (Long, Long) =
    if (x > b._1) (x, b._1)
    else if (x == b._1) b
    else if (x > b._2) (b._1, x)
    else b

  override def merge(a: (Long, Long), b: (Long, Long)): (Long, Long) = {
    var best = a._1
    var second = a._2
    for (x <- Seq(b._1, b._2) if x != Neg) {
      if (x > best) { second = best; best = x }
      else if (x != best && x > second) { second = x }
    }
    (best, second)
  }

  override def finish(r: (Long, Long)): (Long, Long) = r

  override def bufferEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
  override def outputEncoder: Encoder[(Long, Long)] = Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong)
}
