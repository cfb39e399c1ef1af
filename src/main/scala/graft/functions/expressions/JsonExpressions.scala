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

/** JSON_EXTRACT(json, path) — the value at path serialized back to
  * JSON text (strings keep their quotes; reference filter.rs:5606-5610). */
case class JsonExtract(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(json: Any, path: Any): Any =
    JsonPathNav.resolve(json.asInstanceOf[UTF8String].toString,
        path.asInstanceOf[UTF8String].toString)
      .map(n => UTF8String.fromString(n.toString)).orNull
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "json_extract"
}

/** JSON_EXTRACT_SCALAR(json, path) — scalars unquoted; objects/arrays
  * NULL; JSON null -> the string "null" (reference filter.rs:5613-5623). */
case class JsonExtractScalar(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def nullSafeEval(json: Any, path: Any): Any =
    JsonPathNav.resolve(json.asInstanceOf[UTF8String].toString,
        path.asInstanceOf[UTF8String].toString) match {
      case Some(n) if n.isNull => UTF8String.fromString("null")
      case Some(n) if n.isValueNode => UTF8String.fromString(n.asText())
      case _ => null
    }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "json_extract_scalar"
}

private object JsonBuild {
  val mapper = new ObjectMapper()
  /** Scala runtime value -> JsonNode (reference get_json_value:
    * numbers stay numbers, strings stay strings). */
  def toNode(v: Any): JsonNode = v match {
    case null => mapper.nullNode()
    case b: Boolean => mapper.getNodeFactory.booleanNode(b)
    case i: Int => mapper.getNodeFactory.numberNode(i)
    case l: Long => mapper.getNodeFactory.numberNode(l)
    case f: Float => mapper.getNodeFactory.numberNode(f)
    case d: Double => mapper.getNodeFactory.numberNode(d)
    case d: org.apache.spark.sql.types.Decimal =>
      mapper.getNodeFactory.numberNode(d.toJavaBigDecimal)
    case s: UTF8String => mapper.getNodeFactory.textNode(s.toString)
    case other => mapper.getNodeFactory.textNode(other.toString)
  }
}

/** JSON_OBJECT('k1', v1, 'k2', v2, ...) — build a JSON object string
  * (reference filter.rs:5263-5284). Odd arity is an ANALYSIS error
  * (not a raw `require` blow-up at planning); a NULL key is a RUNTIME
  * error, matching Trino/reference semantics — silently mapping NULL
  * to "" would fabricate a key the user never wrote. */
case class JsonObjectExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (children.nonEmpty && children.size % 2 == 0)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"json_object requires a positive even number of arguments (key/value pairs), got ${children.size}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val obj = JsonBuild.mapper.createObjectNode()
    children.grouped(2).foreach { case Seq(k, v) =>
      val key = k.eval(input)
      if (key == null)
        throw new org.apache.spark.SparkException(
          "json_object: JSON object key cannot be NULL")
      obj.set[JsonNode](key.toString, JsonBuild.toNode(v.eval(input)))
    }
    UTF8String.fromString(obj.toString)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
  override def prettyName: String = "json_object"
}

/** JSON_ARRAY(v1, v2, ...) — build a JSON array string (reference
  * filter.rs:5286-5304). */
case class JsonArrayExpr(children: Seq[Expression])
    extends Expression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val arr = JsonBuild.mapper.createArrayNode()
    children.foreach(c => arr.add(JsonBuild.toNode(c.eval(input))))
    UTF8String.fromString(arr.toString)
  }
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(children = c)
  override def prettyName: String = "json_array"
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
