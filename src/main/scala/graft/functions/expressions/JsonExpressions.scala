package graft.functions.expressions

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Trino JSON functions Spark lacks (reference impls
  * `src/physical/operators/filter.rs:4927-5305`): json_array_get,
  * json_array_contains, is_json_scalar, json_size. Jackson ships with
  * Spark. All return NULL on malformed JSON (Trino behavior). */
object JsonUtil {
  private val mapper = new ObjectMapper()
  def parse(s: String): Option[JsonNode] =
    try Option(mapper.readTree(s)) catch { case _: Exception => None }
}

/** JSON_ARRAY_GET('[1,2,3]', i) — element at 0-based index (negative =
  * from end), serialized back to a JSON string. */
case class JsonArrayGet(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(json: Any, idx: Any): Any = {
    JsonUtil.parse(json.asInstanceOf[UTF8String].toString) match {
      case Some(n) if n.isArray =>
        val i0 = idx.asInstanceOf[Long].toInt
        val i = if (i0 < 0) n.size() + i0 else i0
        if (i >= 0 && i < n.size()) {
          val el = n.get(i)
          UTF8String.fromString(if (el.isTextual) el.asText() else el.toString)
        } else null
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "json_array_get"
}

/** JSON_ARRAY_CONTAINS('[1,2,3]', value) — scalar membership. */
case class JsonArrayContains(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(json: Any, value: Any): Any = {
    JsonUtil.parse(json.asInstanceOf[UTF8String].toString) match {
      case Some(n) if n.isArray =>
        val it = n.elements()
        var found = false
        while (!found && it.hasNext) {
          val el = it.next()
          found = (value, el) match {
            case (v: java.lang.Number, e) if e.isIntegralNumber => e.asLong() == v.longValue()
            case (v: java.lang.Number, e) if e.isNumber => e.asDouble() == v.doubleValue()
            case (v: Boolean, e) if e.isBoolean => e.asBoolean() == v
            case (v: UTF8String, e) if e.isTextual => e.asText() == v.toString
            case _ => false
          }
        }
        found
      case _ => null
    }
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "json_array_contains"
}

/** IS_JSON_SCALAR('1' | '"a"' | 'true') — true for valid scalar JSON. */
case class IsJsonScalar(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonUtil.parse(v.asInstanceOf[UTF8String].toString) match {
      case Some(n) => !n.isContainerNode
      case None => null
    }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "is_json_scalar"
}

/** JSON_PARSE(str) — validate + canonicalize a JSON string (Trino
  * returns a JSON value; here the canonical serialization). Errors on
  * malformed input, like Trino. */
case class JsonParse(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    JsonUtil.parse(s) match {
      case Some(n) => UTF8String.fromString(n.toString)
      case None => throw new IllegalArgumentException(s"invalid JSON: $s")
    }
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "json_parse"
}

/** JSON_FORMAT(json) — serialize a JSON value to text (inverse of
  * json_parse; canonical form). */
case class JsonFormat(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonUtil.parse(v.asInstanceOf[UTF8String].toString)
      .map(n => UTF8String.fromString(n.toString)).orNull
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "json_format"
}

/** JSON_EXISTS(json, '$.path') — true when the path resolves. Shares
  * get_json_object's dotted-path dialect (the reference's navigation,
  * filter.rs:5684-5775, supports the same $.a[0].b shape). */
case class JsonExists(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def nullSafeEval(json: Any, path: Any): Any =
    JsonPathNav.resolve(json.asInstanceOf[UTF8String].toString,
      path.asInstanceOf[UTF8String].toString).isDefined
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "json_exists"
}

/** Shared minimal jsonpath navigation: $.a.b[i] chains. */
object JsonPathNav {
  def resolve(json: String, path: String): Option[JsonNode] = {
    JsonUtil.parse(json).flatMap { root =>
      if (!path.startsWith("$")) return None
      var node: JsonNode = root
      val steps = path.drop(1)
      val token = """\.([A-Za-z0-9_]+)|\[(\d+)\]""".r
      var consumed = 0
      for (m <- token.findAllMatchIn(steps)) {
        if (node == null) return None
        consumed += m.matched.length
        node =
          if (m.group(1) != null) node.get(m.group(1))
          else if (node.isArray) node.get(m.group(2).toInt)
          else null
      }
      if (consumed != steps.length) None else Option(node)
    }
  }
}

/** JSON_SIZE(json) — size of the outermost value: object field count /
  * array length / 0 for scalars (Trino semantics). */
case class JsonSize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def nullSafeEval(v: Any): Any =
    JsonUtil.parse(v.asInstanceOf[UTF8String].toString) match {
      case Some(n) if n.isContainerNode => n.size().toLong
      case Some(_) => 0L
      case None => null
    }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "json_size"
}
