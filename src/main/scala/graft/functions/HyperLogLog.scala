package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** HyperLogLog distinct sketch as a typed Spark [[Aggregator]] (Flajolet
  * et al., AofA 2007): `m = 2^p` byte-sized registers, each holding the
  * maximum "rank" (position of the first 1-bit) seen among the hashes
  * routed to it. The constant-memory counterpart to [[KMinValues]]: KMV
  * keeps k exact hash minima (and so replays exactly), HLL keeps 2^p
  * bounded counters — at p=9 that is 512 ints of state for ~4.6% standard
  * error (1.04/sqrt(m)) regardless of cardinality, the shape that counts
  * distinct URLs per domain across 100 TB without the state ever growing.
  *
  * Input is an already-hashed long in [0, 2^60) — callers derive it with
  * the ONE shared [[graft.ops.Stats.hash60]] expression (the [[BloomBits]]
  * discipline), so a replaying oracle provably hashes identically. The
  * top `p` bits pick the register, the remaining `60-p` bits w give
  * rank = (60-p) + 1 - bitlength(w) (bitlength(0) = 0, so an all-zero
  * suffix yields the max rank 60-p+1). Register updates are max()
  * operations: order-free, idempotent, mergeable by elementwise max —
  * deterministic under any partitioning AND under re-aggregation of
  * partial sketches, which is what makes persisted per-shard sketches
  * safely re-mergeable months later.
  *
  * The estimator is NOT computed here: [[finish]] returns the dense
  * register array and [[graft.ops.Stats.hllDistinctBy]] derives the
  * harmonic sum as an exact integer (sum of 2^(maxRank - M_j), at most
  * 2^61 so it cannot overflow a long) plus the zero-register count — both
  * exact integer functions of the hash set, so an external engine replays
  * them bit-for-bit and the double-valued estimate derived from them is
  * reproducible to the printed rounding.
  */
class HyperLogLog(p: Int)
    extends Aggregator[Long, Array[Int], Array[Int]] {
  require(p >= 4 && p <= 16, "precision p must be in [4, 16]")

  private val m = 1 << p
  private val mBits = 60 - p // significant bits left after register routing

  def zero: Array[Int] = new Array[Int](m)

  def reduce(b: Array[Int], h: Long): Array[Int] = {
    val j = (h >>> mBits).toInt
    val w = h & ((1L << mBits) - 1)
    // bitlength(w) = 64 - nlz(w) for w > 0, 0 for w = 0
    val bitLen = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
    val rank = mBits + 1 - bitLen
    if (rank > b(j)) b(j) = rank
    b
  }

  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var i = 0
    while (i < m) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** The dense register array (length m; 0 = register never touched). */
  def finish(b: Array[Int]): Array[Int] = b

  def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()

  def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}
