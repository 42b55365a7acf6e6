package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

import scala.collection.mutable

/** Misra-Gries heavy-hitters sketch as a typed Spark [[Aggregator]]:
  * one streaming pass, O(`capacity`) state per partition, mergeable — the
  * classic frequent-items summary (Misra & Gries 1982; merge rule from
  * Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * Guarantee: for every item, `true_count - n/capacity <= estimate <=
  * true_count` where n is the stream length; any item with frequency
  * > n/capacity is guaranteed to survive. With capacity > |distinct
  * items| the sketch is EXACT (no decrement ever fires) — the property
  * the spec uses to pin it against the exact
  * [[graft.ops.TextOps.topNgrams]].
  *
  * Scale shape vs the exact top-k: the exact path shuffles the full
  * vocabulary once (fine when the vocabulary fits a shuffle); this sketch
  * reduces each partition to `capacity` (item, weight) pairs before the
  * exchange, so network cost is capacity * partitions regardless of
  * vocabulary size — the shape for unbounded-vocabulary corpora (URLs,
  * raw n-grams at 100 TB) where an exact count is not worth the shuffle.
  * Runs as an ObjectHashAggregate (sketch state is a hash map, not an
  * unsafe row) — the standard physical form for sketch aggregates; the
  * per-row update is O(1) amortized (a decrement sweep is O(capacity)
  * but fires at most n/capacity times).
  */
class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.Map[String, Long], Map[String, Long]] {
  require(capacity > 0, "capacity must be positive")

  def zero: mutable.Map[String, Long] = mutable.Map.empty

  /** Count `item`; when full and unseen, decrement every counter and drop
    * zeros — the MG step. */
  def reduce(b: mutable.Map[String, Long], item: String): mutable.Map[String, Long] = {
    if (b.contains(item)) b(item) += 1L
    else if (b.size < capacity) b(item) = 1L
    else {
      val dead = mutable.ArrayBuffer.empty[String]
      for ((k, v) <- b) { if (v == 1L) dead += k else b(k) = v - 1L }
      dead.foreach(b.remove)
    }
    b
  }

  /** Mergeable-summaries rule: add counters; if over capacity, subtract
    * the (capacity+1)-th largest weight from all and drop non-positives —
    * preserves the one-sided undercount bound. */
  def merge(a: mutable.Map[String, Long], b: mutable.Map[String, Long]): mutable.Map[String, Long] = {
    for ((k, v) <- b) a(k) = a.getOrElse(k, 0L) + v
    if (a.size > capacity) {
      val cut = a.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = mutable.ArrayBuffer.empty[String]
      for ((k, v) <- a) { if (v - cut <= 0L) dead += k else a(k) = v - cut }
      dead.foreach(a.remove)
    }
    a
  }

  def finish(b: mutable.Map[String, Long]): Map[String, Long] = b.toMap

  // the buffer is in-flight partition state (ObjectHashAggregate holds it
  // as a JVM object; kryo only serializes it across the partial/final
  // exchange — capacity-bounded, so the exchange stays small by design)
  def bufferEncoder: Encoder[mutable.Map[String, Long]] =
    Encoders.kryo[mutable.Map[String, Long]]

  def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object MisraGries {
  /** Typed column: `ds.select(MisraGries.sketch(64))` over a Dataset of
    * items yields one map<string,bigint> of survivors to estimates. */
  def sketch(capacity: Int): TypedColumn[String, Map[String, Long]] =
    new MisraGries(capacity).toColumn
}
