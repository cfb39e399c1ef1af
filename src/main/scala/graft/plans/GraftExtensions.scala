package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Session extensions for the engine: a Trino-dialect parser shim.
  *
  * Trino (and the reference, which follows Trino's function surface —
  * binder `src/planner/binder.rs:1504+`) writes datetime units as string
  * literals: `date_add('day', 5, ts)`. Spark's parser special-cases
  * those function names and requires bare identifiers
  * (`date_add(DAY, 5, ts)`), erroring before function resolution can
  * run. The shim rewrites the quoted-unit form to the identifier form
  * pre-parse; everything else passes through untouched.
  */
class TrinoDialectParser(delegate: ParserInterface) extends ParserInterface {

  private val quotedUnit =
    """(?i)\b(date_add|dateadd|date_diff|datediff|timestampadd|timestampdiff|date_trunc|trunc)\(\s*'(year|quarter|month|week|day|dayofyear|hour|minute|second|millisecond|microsecond)'\s*,""".r

  // Trino/DuckDB accept bare `VARCHAR`/`VARBINARY` as cast targets
  // (reference golden query expr/cast: `CAST(100 AS VARCHAR)`); Spark's
  // parser requires STRING/BINARY (VARCHAR only with a length). Rewrite
  // the bare forms; parameterized VARCHAR(n) passes through untouched.
  private val bareVarchar = """(?i)\bAS\s+VARCHAR\s*([,)])""".r
  private val bareVarbinary = """(?i)\bAS\s+VARBINARY\s*([,)])""".r

  private[graft] def rewrite(sql: String): String = {
    val units = quotedUnit.replaceAllIn(sql, m =>
      // date_trunc/trunc keep Spark's own quoted-string unit convention
      if (m.group(1).toLowerCase.contains("trunc")) m.matched
      else s"${m.group(1)}(${m.group(2)},")
    bareVarbinary.replaceAllIn(
      bareVarchar.replaceAllIn(units, m => s"AS STRING${m.group(1)}"),
      m => s"AS BINARY${m.group(1)}")
  }

  override def parsePlan(sqlText: String): LogicalPlan = delegate.parsePlan(rewrite(sqlText))
  override def parseQuery(sqlText: String): LogicalPlan = delegate.parseQuery(rewrite(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(rewrite(sqlText))
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType = delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectParser((_, delegate) => new TrinoDialectParser(delegate))
  }
}
