package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** [[HyperLogLog]] with a sparse partial buffer — same registers out,
  * bit-for-bit (the estimator, the t85 oracle and [[graft.ops.Stats
  * .hllDistinctBy]] replay unchanged); only the AGGREGATION STATE
  * representation differs. Dense HLL pays 2^p ints per (group,
  * partition) partial from the first row; for many-small-groups
  * workloads (count distinct users per URL across 100 TB: billions of
  * groups, most tiny) almost all of that state is zeros shuffled for
  * nothing. Here a partial stays a sorted array of packed
  * (register << 7 | rank) ints — one entry per TOUCHED register — and
  * densifies only once it crosses m/4 entries, so a group with d
  * distinct values costs min(d, m/4) ints until it genuinely needs the
  * flat form. The classic sparse/dense HLL split (HLL++, Heule et al.
  * 2013 §5.3 — without the varint encoding, which buys nothing inside
  * a JVM row buffer).
  *
  * Packing invariant: rank ≤ 60-p+1 ≤ 57 < 2^7 fits the low 7 bits,
  * register < 2^16 fits above them, and because rank occupies the low
  * bits a sort on the packed int IS a sort on (register, rank). The
  * two forms are distinguishable by length alone: sparse holds at most
  * the densify cap (< m) entries — an insert that would exceed it
  * densifies — dense exactly m.
  *
  * `sparseCap` is the densify threshold (entries, not bytes); 0 takes
  * the default m/4. The tradeoff it tunes: a LOWER cap densifies
  * sooner (bounds the O(n) sorted-insert cost per new register but
  * pays the flat 2^p state earlier), a HIGHER cap keeps partials small
  * longer at quadratic insert cost near the cap. ScaleSpec's x85s
  * sweep measures both regimes; m/4 sits in the flat region of the
  * crossing workload while keeping the cap well under the point where
  * insert cost dominates, which is why it is the default (the HLL++
  * §5.3 choice lands there for the same reason).
  */
class HyperLogLogSparse(p: Int, sparseCap: Int = 0)
    extends Aggregator[Long, Array[Int], Array[Int]] {
  require(p >= 4 && p <= 16, "precision p must be in [4, 16]")

  require(sparseCap >= 0, // a negative "cap" silently meaning default
    s"sparseCap must be >= 0 (0 = the m/4 default); got $sparseCap")

  private val m = 1 << p
  private val mBits = 60 - p
  private val sparseMax = if (sparseCap > 0) sparseCap else m / 4
  require(sparseMax < m, s"sparseCap must stay under m=$m (dense is " +
    "detected by length == m)")

  def zero: Array[Int] = Array.emptyIntArray

  private def isDense(b: Array[Int]): Boolean = b.length == m

  private def densify(b: Array[Int]): Array[Int] = {
    if (isDense(b)) return b
    val d = new Array[Int](m)
    var i = 0
    while (i < b.length) { d(b(i) >>> 7) = b(i) & 0x7f; i += 1 }
    d
  }

  /** Insert (j, rank) into a sorted sparse buffer; max-merge on an
    * existing entry for j. Returns the (possibly grown) buffer. */
  private def sparseUpdate(b: Array[Int], j: Int, rank: Int): Array[Int] = {
    // one entry per register, so search on the register prefix alone:
    // the entry for j (any rank) sorts within [j<<7, j<<7 | 0x7f]
    var lo = 0
    var hi = b.length - 1
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val mj = b(mid) >>> 7
      if (mj < j) lo = mid + 1
      else if (mj > j) hi = mid - 1
      else {
        if (rank > (b(mid) & 0x7f)) b(mid) = (j << 7) | rank
        return b
      }
    }
    val out = new Array[Int](b.length + 1)
    System.arraycopy(b, 0, out, 0, lo)
    out(lo) = (j << 7) | rank
    System.arraycopy(b, lo, out, lo + 1, b.length - lo)
    if (out.length > sparseMax) densify(out) else out
  }

  def reduce(b: Array[Int], h: Long): Array[Int] = {
    val j = (h >>> mBits).toInt
    val w = h & ((1L << mBits) - 1)
    val bitLen = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
    val rank = mBits + 1 - bitLen
    if (isDense(b)) { if (rank > b(j)) b(j) = rank; b }
    else sparseUpdate(b, j, rank)
  }

  def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    if (isDense(a) || isDense(b)) {
      val d = densify(a)
      if (isDense(b)) {
        var i = 0
        while (i < m) { if (b(i) > d(i)) d(i) = b(i); i += 1 }
      } else {
        var i = 0
        while (i < b.length) {
          val j = b(i) >>> 7
          val rk = b(i) & 0x7f
          if (rk > d(j)) d(j) = rk
          i += 1
        }
      }
      return d
    }
    // both sparse: linear merge of two (register, rank)-sorted arrays,
    // per-register max — stays sorted by construction
    val out = new Array[Int](a.length + b.length)
    var (i, k, n) = (0, 0, 0)
    while (i < a.length && k < b.length) {
      val (ja, jb) = (a(i) >>> 7, b(k) >>> 7)
      if (ja < jb) { out(n) = a(i); i += 1 }
      else if (jb < ja) { out(n) = b(k); k += 1 }
      else { out(n) = math.max(a(i), b(k)); i += 1; k += 1 }
      n += 1
    }
    while (i < a.length) { out(n) = a(i); i += 1; n += 1 }
    while (k < b.length) { out(n) = b(k); k += 1; n += 1 }
    val trimmed = if (n == out.length) out else java.util.Arrays.copyOf(out, n)
    if (trimmed.length > sparseMax) densify(trimmed) else trimmed
  }

  /** Always the dense register array — identical to [[HyperLogLog]]. */
  def finish(b: Array[Int]): Array[Int] = densify(b)

  def bufferEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()

  def outputEncoder: Encoder[Array[Int]] = ExpressionEncoder[Array[Int]]()
}
