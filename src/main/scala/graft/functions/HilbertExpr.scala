package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Hilbert curve index — the locality-preserving alternative to the Morton
  * interleave in [[graft.ops.Layout.zValue]]. Both map k-dim points to a
  * 1-dim sort key so range-partitioned files cover compact
  * hyper-rectangles; Hilbert additionally never jumps across the domain
  * between consecutive curve positions (Morton's "diagonal seams" at
  * quadrant boundaries), so per-file bounding boxes are tighter and box
  * queries touch fewer files (Moon et al., TKDE 2001 — the clustering
  * analysis behind HBASE-/Iceberg-style Hilbert layout options).
  *
  * The index is the standard per-bit state machine (quadrant digit +
  * reflect/transpose, cf. the public-domain xy2d formulation on the
  * Hilbert-curve Wikipedia page): for s = 2^(bits-1) … 1, the quadrant
  * digit is (3·rx) XOR ry and the frame then reflects/transposes so the
  * child quadrant is traversed in curve order. A tight JVM loop per row
  * (O(bits), zero allocation) with inline codegen — and because every
  * step is integer compare/add arithmetic, an external engine replays it
  * level-for-level (the DuckDB oracle runs the same loop as a recursive
  * CTE).
  */
object CurveKernels {
  /** Hilbert curve position of (x, y) on the 2^bits × 2^bits grid.
    * Inputs must already be non-negative ranks below 2^bits (callers
    * bucket real keys first — [[graft.ops.Layout]]'s contract). */
  def hilbertD(xIn: Long, yIn: Long, bits: Int): Long = {
    val n = 1L << bits
    var x = xIn
    var y = yIn
    var d = 0L
    var s = n >> 1
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * ((3L * rx) ^ ry)
      if (ry == 0) { // reflect (rx=1) then transpose the frame
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }
}

/** `hilbert_d(x, y)` — Hilbert position of two long ranks, native kernel. */
case class HilbertIndexExpr(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits >= 1 && bits <= 31, "hilbert_d needs bits in [1, 31]")
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hilbert_d requires two bigint arguments, got " +
          s"${l.simpleString(10)} and ${r.simpleString(10)}")
    }
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    CurveKernels.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.CurveKernels.hilbertD($a, $b, $bits);")
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): HilbertIndexExpr = copy(left = l, right = r)
  override def prettyName: String = "hilbert_d"
}

object HilbertIndexExpr {
  import org.apache.spark.sql.GraftColumnBridge.{column, expression}
  def hilbert_d(x: Column, y: Column, bits: Int): Column =
    column(HilbertIndexExpr(expression(x), expression(y), bits))
}
