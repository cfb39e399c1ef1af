package graft.functions.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** 64-bit Morton (Z-order) code: interleaves the bits of 1-4
  * pre-scaled 16-bit column codes, MSB-first and round-robin across
  * columns, so that sorting by the output orders rows along a
  * space-filling curve — nearby rows are nearby in EVERY input
  * dimension at once. This is the interleaved-bits column
  * [[graft.sources.IcebergLite.cluster]] feeds its range-repartition
  * when `zorder = true`: each output file then covers a roughly
  * square region of the key space instead of a thin lexicographic
  * slab, and min/max file skipping becomes effective on ALL
  * clustered columns rather than only the leading one — the same
  * multi-dimensional-clustering trade Iceberg's
  * `rewrite_data_files(strategy => 'sort', sort_order => 'zorder(..)')`
  * and Delta's `OPTIMIZE ... ZORDER BY` make. The reference engine is
  * read-only over its tables (`/root/reference/src/physical/operators/
  * iceberg.rs` has no maintenance ops at all ➕).
  *
  * Inputs are IntegerType codes already scaled to [0, 65535]
  * (out-of-range values are clamped, NULL reads as 0 so null rows
  * sort first, like NULLS FIRST). With k columns the result uses the
  * low 16·k bits, so the Long orders correctly for any k ≤ 4.
  * Evaluated once per row in a maintenance rewrite — not a
  * query-time hot path — so interpreted eval (CodegenFallback) is
  * the right cost point.
  */
case class ZOrderCode(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.isEmpty || children.size > 4)
      TypeCheckResult.TypeCheckFailure(s"zorder_code takes 1-4 columns, got ${children.size}")
    else if (!children.forall(_.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(
        s"zorder_code expects int codes in [0, 65535], got ${children.map(_.dataType).mkString(", ")}")
    else TypeCheckResult.TypeCheckSuccess

  override def eval(input: InternalRow): Any = {
    val k = children.size
    val codes = new Array[Int](k)
    var i = 0
    while (i < k) {
      val v = children(i).eval(input)
      codes(i) =
        if (v == null) 0
        else math.max(0, math.min(65535, v.asInstanceOf[Int]))
      i += 1
    }
    var out = 0L
    var b = 15
    while (b >= 0) {
      i = 0
      while (i < k) {
        out = (out << 1) | ((codes(i) >> b) & 1)
        i += 1
      }
      b -= 1
    }
    out
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): ZOrderCode = copy(children = cs)
  override def prettyName: String = "zorder_code"
}

/** Rank (quantile) bucket code for z-order clustering: binary-searches
  * the row's value in a sorted boundary array computed once at plan
  * time (approx-percentile for numerics, a distributed sample for
  * strings — the same sketch-then-broadcast shape Spark's own
  * RangePartitioner uses) and returns the bucket index in
  * [0, boundaries.length]. This replaces min/max linear scaling as
  * [[graft.sources.IcebergLite.cluster]]'s code source when
  * `quantileCoded = true`, fixing its two documented limitations
  * (IcebergLite cluster Scaladoc): a SKEWED column no longer wastes
  * most of the 16-bit code range on an empty tail (every bucket holds
  * ~1/N of the rows by construction), and STRING keys — which cannot
  * be linearly scaled at all — code by rank like any other type.
  *
  * `boundaries` are plan-time constants (Double for numeric input,
  * UTF8String for string input), ≤ a few hundred values — driver
  * footprint is bounded and the closure ships once per task. NULL
  * codes to bucket 0 (NULLS FIRST, matching ZOrderCode). Like
  * ZOrderCode this evaluates once per row inside a maintenance
  * rewrite, so interpreted eval is the right cost point. */
case class QuantileBucket(child: Expression, boundaries: IndexedSeq[Any])
    extends Expression with CodegenFallback {
  override def children: Seq[Expression] = Seq(child)
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (boundaries.isEmpty)
      TypeCheckResult.TypeCheckFailure("quantile_bucket needs at least one boundary")
    else child.dataType match {
      case DoubleType | StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"quantile_bucket expects a double or string input, got $t")
    }

  private def cmp(v: Any, b: Any): Int = v match {
    case d: java.lang.Double => java.lang.Double.compare(d, b.asInstanceOf[Double])
    case s: org.apache.spark.unsafe.types.UTF8String =>
      s.compareTo(b.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) return 0
    // upper bound: number of boundaries <= v
    var lo = 0
    var hi = boundaries.length
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (cmp(v, boundaries(mid)) >= 0) lo = mid + 1 else hi = mid
    }
    lo
  }

  override protected def withNewChildrenInternal(
      cs: IndexedSeq[Expression]): QuantileBucket = copy(child = cs.head)
  override def prettyName: String = "quantile_bucket"
}
