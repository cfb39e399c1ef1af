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

  // matched against the END of a code segment: a datetime function whose
  // next token (the following string literal) is its unit argument.
  // date_trunc/trunc are deliberately absent — Spark keeps their quoted
  // unit convention.
  private val unitFnTail =
    """(?i)\b(date_add|dateadd|date_diff|datediff|timestampadd|timestampdiff)\(\s*$""".r
  private val unitLiteral =
    """(?i)^'(year|quarter|month|week|day|dayofyear|hour|minute|second|millisecond|microsecond)'$""".r

  // Trino/DuckDB accept bare `VARCHAR`/`VARBINARY` as cast targets
  // (reference golden query expr/cast: `CAST(100 AS VARCHAR)`); Spark's
  // parser requires STRING/BINARY (VARCHAR only with a length). Rewrite
  // the bare forms; parameterized VARCHAR(n) passes through untouched.
  private val bareVarchar = """(?i)\bAS\s+VARCHAR\s*([,)])""".r
  private val bareVarbinary = """(?i)\bAS\s+VARBINARY\s*([,)])""".r

  /** Split `sql` into alternating code / quoted segments (shared
    * walker: graft.SqlText). Quoted segments are returned VERBATIM
    * including their quotes — rewrites must never fire inside them (a
    * literal containing `AS VARCHAR)` is data, not syntax). Escape
    * rules track the LIVE session confs, so the walker segments
    * exactly what the delegate parser will parse: backslash escapes
    * apply inside `'...'` unless `escapedStringLiterals=true`, and
    * inside `"..."` only when those are string literals too — i.e.
    * `doubleQuotedIdentifiers=false`, the vanilla default; Engine
    * .session sets it true, making `"..."` identifiers with `""`
    * doubling only (round-5 advisory: assuming that conf here would
    * mis-segment in a vanilla session and let rewrites fire inside
    * literal data). */
  private def segments(sql: String): Vector[String] = {
    val conf = org.apache.spark.sql.internal.SQLConf.get
    val backslash =
      !conf.getConfString("spark.sql.parser.escapedStringLiterals", "false").toBoolean
    val dqIdentifiers =
      conf.getConfString("spark.sql.ansi.doubleQuotedIdentifiers", "false").toBoolean
    graft.SqlText.splitQuoted(sql, backslashInSingleQuotes = backslash,
      backslashInDoubleQuotes = backslash && !dqIdentifiers)
  }

  private[graft] def rewrite(sql: String): String = {
    val segs = segments(sql)
    val sb = new StringBuilder
    var i = 0
    while (i < segs.length) {
      if (i % 2 == 0) {
        // code segment: cast-target rewrites are literal-safe here
        sb.append(bareVarbinary.replaceAllIn(
          bareVarchar.replaceAllIn(segs(i), m => s"AS STRING${m.group(1)}"),
          m => s"AS BINARY${m.group(1)}"))
        i += 1
      } else {
        // quoted segment: rewrite ONLY the quoted-unit idiom — a unit
        // literal directly following `date_add(` etc. in the preceding
        // code segment, with a comma right after — to the bare
        // identifier Spark's parser requires
        val isUnitArg = unitLiteral.findFirstMatchIn(segs(i)).filter { _ =>
          unitFnTail.findFirstIn(segs(i - 1)).isDefined &&
            (i + 1 < segs.length) && segs(i + 1).matches("""(?s)\s*,.*""")
        }
        isUnitArg match {
          case Some(m) => sb.append(m.group(1))
          case None => sb.append(segs(i))
        }
        i += 1
      }
    }
    sb.toString
  }

  // view DDL addressed at a graft catalog is claimed HERE: the
  // builtin ResolveSessionCatalog refuses non-session view statements
  // before any extension resolution rule could (SqlCatalog.scala,
  // GraftViewStatements)
  override def parsePlan(sqlText: String): LogicalPlan =
    GraftViewStatements.claim(delegate.parsePlan(rewrite(sqlText)))
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
    // SQL-visible catalog tables (see SqlCatalog.scala): name/time-
    // travel/INSERT resolution in the analyzer, metadata pruning for
    // WHERE clauses in the operator-optimization batch
    e.injectResolutionRule(session => GraftSqlResolution(session))
    e.injectOptimizerRule(session => GraftMetadataPrune(session))
    // SQL faces for the relation-producing LLM operators (TVFs)
    LlmTableFunctions.register(e)
  }
}
