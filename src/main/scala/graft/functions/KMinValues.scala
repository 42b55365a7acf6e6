package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** k-minimum-values distinct sketch as a typed Spark [[Aggregator]]:
  * keep the `k` smallest DISTINCT hash values seen; the k-th smallest,
  * read as a fraction of the hash space, estimates the distinct count as
  * `(k-1) / kth_fraction` (Bar-Yossef et al., "Counting distinct
  * elements in a data stream", RANDOM 2002; the KMV/bottom-k form of
  * Beyer et al., SIGMOD 2007). With fewer than `k` distinct values the
  * sketch IS the distinct set and the count is exact — the property the
  * spec pins.
  *
  * Input is an already-hashed long in [0, 2^60) — callers derive it with
  * one shared column expression ([[graft.ops.Stats.hash60]], the
  * [[BloomBits]] discipline) so the production path and a replaying
  * oracle provably hash identically, and the sketch itself is pure
  * order-free set algebra: any reduce/merge tree yields the same k
  * minima, so the result is deterministic under Spark's partition
  * nondeterminism AND replayable by an external engine sorting the same
  * hashes.
  *
  * Scale shape: O(k) state per partition, mergeable (union, trim to k)
  * — each partition reduces its rows to at most k longs before the
  * exchange, so a per-group distinct count over an unbounded value
  * domain (URLs, shingles, user ids at 100 TB) costs k * partitions
  * network instead of a full distinct shuffle. Runs as an
  * ObjectHashAggregate like [[MisraGries]]; per-row update is one
  * TreeSet probe/insert, O(log k).
  */
class KMinValues(k: Int)
    extends Aggregator[Long, java.util.TreeSet[Long], Array[Long]] {
  require(k > 1, "k must be at least 2 (the estimator divides by k-1)")

  def zero: java.util.TreeSet[Long] = new java.util.TreeSet[Long]()

  def reduce(b: java.util.TreeSet[Long], h: Long): java.util.TreeSet[Long] = {
    b.add(h)
    if (b.size > k) b.pollLast()
    b
  }

  def merge(a: java.util.TreeSet[Long],
            b: java.util.TreeSet[Long]): java.util.TreeSet[Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  /** The at-most-k smallest distinct hashes, ascending. */
  def finish(b: java.util.TreeSet[Long]): Array[Long] = {
    val out = new Array[Long](b.size)
    val it = b.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def bufferEncoder: Encoder[java.util.TreeSet[Long]] =
    Encoders.kryo[java.util.TreeSet[Long]]

  def outputEncoder: Encoder[Array[Long]] =
    ExpressionEncoder[Array[Long]]()
}
