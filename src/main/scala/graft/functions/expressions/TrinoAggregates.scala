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
    val x = Cast(child, DoubleType)
    Seq(
      If(IsNull(x), sumLog, Add(sumLog, Log(x))),
      If(IsNull(x), cnt, Add(cnt, Literal(1L))))
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

/** CHECKSUM(x) — order-independent content hash (reference
  * hash_agg.rs:1630): sum of per-row xxhash64 values with wraparound.
  * Addition commutes, so the result is identical for any partitioning /
  * merge order — the property that makes it usable as a 100 TB
  * table-diff primitive. */
case class Checksum(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  private lazy val acc = AttributeReference("acc", LongType, nullable = false)()

  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(acc)
  override lazy val initialValues: Seq[Expression] = Seq(Literal(0L))
  override lazy val updateExpressions: Seq[Expression] = Seq(
    Add(acc, XxHash64(Seq(child), 42L), EvalMode.LEGACY))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    Add(acc.left, acc.right, EvalMode.LEGACY))
  override lazy val evaluateExpression: Expression = acc
  override protected def withNewChildInternal(c: Expression): Checksum = copy(child = c)
  override def prettyName: String = "checksum"
}
