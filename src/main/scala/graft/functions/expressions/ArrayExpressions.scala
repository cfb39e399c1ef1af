package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Trino array functions the reference binds but leaves NotImplemented
  * (binder.rs:2683-2703) and Spark lacks natively — implemented here so
  * the full binder name surface executes (➕ exceeds reference).
  * Element comparison uses the same object equality Spark's
  * array_position family uses for atomic types. */
private object ArrayExprUtil {
  def elems(arr: Any, et: DataType): Array[AnyRef] =
    arr.asInstanceOf[ArrayData].toObjectArray(et).asInstanceOf[Array[AnyRef]]
  def eq(a: AnyRef, b: AnyRef): Boolean = java.util.Objects.equals(a, b)
}

/** NGRAMS(array, n) — sliding n-element windows in order; n >= array
  * length yields the single whole-array ngram (Trino semantics). */
case class NGramsArray(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType = left.dataType.asInstanceOf[ArrayType]
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(arr: Any, nv: Any): Any = {
    val n = nv.asInstanceOf[Number].intValue()
    if (n < 1) return null
    val xs = ArrayExprUtil.elems(arr, elemType.elementType)
    val windows =
      if (xs.length <= n) Array(xs)
      else xs.sliding(n).toArray
    new GenericArrayData(windows.map(w => new GenericArrayData(w): Any))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "ngrams"
}

/** COMBINATIONS(array, n) — n-element subsequences in index order;
  * n > length yields empty, n = 0 yields [[]] (Trino semantics, which
  * also caps n at 5 — enforced here to bound output size). */
case class CombinationsArray(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType = left.dataType.asInstanceOf[ArrayType]
  override def dataType: DataType = ArrayType(elemType, containsNull = false)
  override def nullable: Boolean = true
  override def nullSafeEval(arr: Any, nv: Any): Any = {
    val n = nv.asInstanceOf[Number].intValue()
    if (n < 0 || n > 5) return null
    val xs = ArrayExprUtil.elems(arr, elemType.elementType)
    val out = scala.collection.mutable.ArrayBuffer.empty[Any]
    def rec(start: Int, acc: List[AnyRef]): Unit =
      if (acc.length == n) out += new GenericArrayData(acc.reverse.toArray)
      else {
        var i = start
        while (i <= xs.length - (n - acc.length)) {
          rec(i + 1, xs(i) :: acc)
          i += 1
        }
      }
    rec(0, Nil)
    new GenericArrayData(out.toArray)
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "combinations"
}

/** CONTAINS_SEQUENCE(array, seq) — true iff seq appears as a
  * contiguous subsequence of array (Trino semantics; empty seq is
  * contained in anything). */
case class ContainsSequence(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  private def elemType = left.dataType.asInstanceOf[ArrayType].elementType
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(arr: Any, seq: Any): Any = {
    val xs = ArrayExprUtil.elems(arr, elemType)
    val ys = ArrayExprUtil.elems(seq, elemType)
    if (ys.isEmpty) true
    else {
      var i = 0
      var found = false
      while (!found && i <= xs.length - ys.length) {
        var j = 0
        while (j < ys.length && ArrayExprUtil.eq(xs(i + j), ys(j))) j += 1
        found = j == ys.length
        i += 1
      }
      found
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "contains_sequence"
}
