package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash row sample as a typed Spark [[Aggregator]]: keep the
  * rows whose `k` smallest DISTINCT hash values were seen, carrying one
  * payload double per kept hash. Because the hash is uniform on the key,
  * the kept rows are a uniform random sample of the (distinct-key) rows —
  * but a DETERMINISTIC one: the same keys always win, under any
  * partitioning or merge tree, and an external engine replays the exact
  * sample by sorting the same hashes (the [[KMinValues]] discipline with
  * a value column along for the ride).
  *
  * Hash collisions (two keys on one 60-bit hash, ~2^-60) keep the MIN
  * payload — an order-free tiebreak an oracle mirrors with a
  * `min(v) GROUP BY hash` pre-step.
  *
  * Scale shape: O(k) state per partition, mergeable — the map-side
  * combine reduces every partition to at most k (hash, value) pairs
  * before the exchange. [[graft.ops.Stats.sampleQuantilesBy]] builds
  * bounded-state approximate percentiles on top: the exact `percentile`
  * aggregate shuffles every value; this exchanges k pairs per
  * (group, partition) and pays one aggregate-sized second pass.
  */
class KMinPairs(k: Int)
    extends Aggregator[(Long, Double), java.util.TreeMap[Long, Double],
      Array[Double]] {
  require(k >= 1, "k must be at least 1")

  def zero: java.util.TreeMap[Long, Double] =
    new java.util.TreeMap[Long, Double]()

  private def put(b: java.util.TreeMap[Long, Double], h: Long,
                  v: Double): Unit = {
    // containsKey, not get: Scala auto-unboxes a missing key's null to
    // 0.0, which would silently drop every non-negative value
    if (!b.containsKey(h) || v < b.get(h)) b.put(h, v)
    if (b.size > k) b.pollLastEntry()
    ()
  }

  def reduce(b: java.util.TreeMap[Long, Double],
             in: (Long, Double)): java.util.TreeMap[Long, Double] = {
    put(b, in._1, in._2)
    b
  }

  def merge(a: java.util.TreeMap[Long, Double],
            b: java.util.TreeMap[Long, Double]): java.util.TreeMap[Long, Double] = {
    val it = b.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      put(a, e.getKey, e.getValue)
    }
    a
  }

  /** Payload values of the at-most-k smallest distinct hashes, in
    * ascending hash order (a deterministic but hash-random order — the
    * consumer treats it as a multiset). */
  def finish(b: java.util.TreeMap[Long, Double]): Array[Double] = {
    val out = new Array[Double](b.size)
    val it = b.values().iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    out
  }

  def bufferEncoder: Encoder[java.util.TreeMap[Long, Double]] =
    Encoders.kryo[java.util.TreeMap[Long, Double]]

  def outputEncoder: Encoder[Array[Double]] =
    ExpressionEncoder[Array[Double]]()
}
