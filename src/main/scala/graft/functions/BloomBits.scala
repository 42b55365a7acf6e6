package graft.functions

import org.apache.spark.sql.{Encoder, Encoders, TypedColumn}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bloom-filter bit vector as a typed Spark [[Aggregator]] over
  * pre-computed bit POSITIONS: the hash-to-position derivation lives in a
  * column expression ([[graft.ops.Dedup]].bloomPositions — xxhash64 mod
  * m), so build and probe provably use the same function and this
  * aggregator only ever sets bits. One streaming pass, O(m) state per
  * partition, mergeable by bitwise OR — the standard fixed-size set
  * summary (Bloom 1970).
  *
  * The vector is `Array[Boolean]` rather than packed longs: element_at
  * over array<boolean> keeps the PROBE a pure codegen'd expression (no
  * bit-twiddling sub-expressions), and at the default m = 2^20 the
  * broadcast payload is 1 MB — noise next to any corpus-sized frame the
  * filter summarizes.
  *
  * Scale shape: each partition reduces its positions into one m-bit
  * buffer before the exchange, so network cost is m * partitions
  * regardless of how many positions stream in; runs as an
  * ObjectHashAggregate like the Misra-Gries sketch. */
class BloomBits(m: Int)
    extends Aggregator[Long, Array[Boolean], Array[Boolean]] {
  require(m > 0, "m must be positive")

  def zero: Array[Boolean] = new Array[Boolean](m)

  def reduce(b: Array[Boolean], pos: Long): Array[Boolean] = {
    b(pos.toInt) = true
    b
  }

  def merge(a: Array[Boolean], b: Array[Boolean]): Array[Boolean] = {
    var i = 0
    while (i < m) { if (b(i)) a(i) = true; i += 1 }
    a
  }

  def finish(b: Array[Boolean]): Array[Boolean] = b

  def bufferEncoder: Encoder[Array[Boolean]] =
    Encoders.kryo[Array[Boolean]]

  def outputEncoder: Encoder[Array[Boolean]] =
    ExpressionEncoder[Array[Boolean]]()
}

object BloomBits {
  /** Typed column: `positions.as[Long].select(BloomBits.bits(m))` yields
    * one m-element boolean vector with those positions set. */
  def bits(m: Int): TypedColumn[Long, Array[Boolean]] =
    new BloomBits(m).toColumn.name("bf")
}
