package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** GEOMETRIC_MEAN(x) = exp(avg(ln(x))) — the reference accumulates
  * log-sums the same way (hash_agg.rs:324-325). DeclarativeAggregate:
  * pure expressions, so it participates in whole-stage codegen and
  * partial (map-side) aggregation — the merge is two scalar adds, which
  * is what survives a 1000-executor shuffle. */
case class GeometricMean(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  private lazy val sumLog = AttributeReference("sumLog", DoubleType, nullable = false)()
  private lazy val cnt = AttributeReference("cnt", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(sumLog, cnt)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0.0), Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = {
    // exclude NULL and non-positive values from BOTH the log-sum and the
    // count (reference hash_agg.rs:2178-2181). Spark's Log is already
    // NULL for x <= 0 (non-ANSI), so Coalesce(Log(x), 0) skips exactly
    // the rows the reference skips, and the count increments by
    // IsNotNull(Log(x)) — no If-on-buffer branches, which keeps hashAgg
    // whole-stage codegen happy. `def` = fresh instances per use.
    def logX = Log(Cast(child, DoubleType))
    Seq(
      Add(sumLog, Coalesce(Seq(logX, Literal(0.0)))),
      Add(cnt, Cast(IsNotNull(logX), LongType)))
  }
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(sumLog.left, sumLog.right),
    Add(cnt.left, cnt.right))
  override lazy val evaluateExpression: Expression =
    If(EqualTo(cnt, Literal(0L)), Literal(null, DoubleType),
      Exp(Divide(sumLog, Cast(cnt, DoubleType))))
  override protected def withNewChildInternal(c: Expression): GeometricMean = copy(child = c)
  override def prettyName: String = "geometric_mean"
}

/** CHECKSUM(x) — order-independent content hash matching the reference
  * (hash_agg.rs:2184-2193): XOR of the raw values for integral inputs;
  * for other types, XOR of per-row xxhash64 (the reference only defines
  * CHECKSUM for int32/int64). XOR commutes, so the result is identical
  * for any partitioning / merge order — the property that makes it
  * usable as a 100 TB table-diff primitive. NULLs are skipped. */
case class Checksum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private lazy val acc = AttributeReference("acc", LongType, nullable = false)()

  private lazy val rowValue: Expression = child.dataType match {
    case ByteType | ShortType | IntegerType | LongType => Cast(child, LongType)
    case _ => XxHash64(Seq(child), 42L)
  }

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), acc, BitwiseXor(acc, rowValue)))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    BitwiseXor(acc.left, acc.right))
  override lazy val evaluateExpression: Expression = acc
  override protected def withNewChildInternal(c: Expression): Checksum = copy(child = c)
  override def prettyName: String = "checksum"
}
