package graft

import org.apache.spark.sql.types.{LongType, TimestampNTZType}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TrinoDialectParser

class EngineSpec extends AnyFunSuite {
  import TestSpark._

  test("registerDir repairs TIMESTAMP(NANOS) columns to TIMESTAMP_NTZ") {
    Engine.registerDir(spark, sf0001)
    val schema = spark.table("events").schema
    assert(schema("ts").dataType == TimestampNTZType)
    assert(schema("event_id").dataType == LongType)
  }

  test("nanos repair preserves wall-clock values") {
    Engine.registerDir(spark, sf0001)
    val r = spark.sql(
      "SELECT min(ts) AS lo, max(ts) AS hi FROM events").collect()(0)
    val lo = r.getAs[java.time.LocalDateTime]("lo")
    assert(lo.getYear == 2024 && lo.getMonthValue == 1)
  }

  test("registerDir is idempotent and re-registers on dir change") {
    Engine.registerDir(spark, sf0001)
    val n1 = spark.table("region").count()
    Engine.registerDir(spark, "/root/testdata/sf0.01")
    val n2 = spark.table("customer").count()
    Engine.registerDir(spark, sf0001)
    assert(n1 == 5)
    assert(n2 == 1500)
    assert(spark.table("customer").count() == 150)
  }

  test("TrinoDialectParser rewrites only quoted datetime units") {
    val p = new TrinoDialectParser(null)
    assert(p.rewrite("SELECT date_add('day', 1, ts)") == "SELECT date_add(day, 1, ts)")
    assert(p.rewrite("SELECT DATE_DIFF('hour', a, b)") == "SELECT DATE_DIFF(hour, a, b)")
    // date_trunc keeps its quoted unit (Spark's own convention)
    assert(p.rewrite("SELECT date_trunc('day', ts)") == "SELECT date_trunc('day', ts)")
    // arbitrary strings that merely look similar are untouched
    assert(p.rewrite("SELECT 'date_add(''day'' is text'") == "SELECT 'date_add(''day'' is text'")
    assert(p.rewrite("SELECT split_part(x, 'day', 1)") == "SELECT split_part(x, 'day', 1)")
  }

  test("TrinoDialectParser rewrites bare VARCHAR/VARBINARY cast targets") {
    val p = new TrinoDialectParser(null)
    assert(p.rewrite("SELECT CAST(100 AS VARCHAR) FROM t") == "SELECT CAST(100 AS STRING) FROM t")
    assert(p.rewrite("SELECT CAST(x AS varchar), CAST(y AS VARBINARY)")
      == "SELECT CAST(x AS STRING), CAST(y AS BINARY)")
    // parameterized VARCHAR(n) is valid Spark SQL and passes through
    assert(p.rewrite("SELECT CAST(x AS VARCHAR(5))") == "SELECT CAST(x AS VARCHAR(5))")
  }

  test("TrinoDialectParser never rewrites inside string literals or quoted identifiers") {
    val p = new TrinoDialectParser(null)
    // a literal that CONTAINS cast syntax is data, not syntax (r4 advisory)
    assert(p.rewrite("SELECT 'CAST(1 AS VARCHAR)' FROM t") == "SELECT 'CAST(1 AS VARCHAR)' FROM t")
    assert(p.rewrite("SELECT 'x AS VARBINARY), tail'") == "SELECT 'x AS VARBINARY), tail'")
    // quoted identifiers are protected too
    assert(p.rewrite("SELECT a AS \"AS VARCHAR)\" FROM t") == "SELECT a AS \"AS VARCHAR)\" FROM t")
    // escaped-quote literal that embeds the full date_add idiom
    assert(p.rewrite("SELECT 'date_add(''day'', 1, ts) AS VARCHAR)'")
      == "SELECT 'date_add(''day'', 1, ts) AS VARCHAR)'")
    // the real idiom still fires when mixed with benign literals
    assert(p.rewrite("SELECT 'AS VARCHAR)', date_add('day', 1, ts), CAST(1 AS VARCHAR)")
      == "SELECT 'AS VARCHAR)', date_add(day, 1, ts), CAST(1 AS STRING)")
  }

  test("TrinoDialectParser handles backslash-escaped quotes in literals") {
    val p = new TrinoDialectParser(null)
    // Spark's default dialect accepts \' inside a literal — the escaped
    // quote must not close the segment and swallow the rest of the query
    assert(p.rewrite("SELECT 'it\\'s', CAST(1 AS VARCHAR)")
      == "SELECT 'it\\'s', CAST(1 AS STRING)")
    assert(p.rewrite("SELECT 'a\\'b', date_add('day', 1, ts)")
      == "SELECT 'a\\'b', date_add(day, 1, ts)")
    // a trailing backslash before the closing quote is the literal's
    // own escape of the quote — still closed correctly by '' doubling
    assert(p.rewrite("SELECT 'path\\\\', CAST(1 AS VARCHAR)")
      == "SELECT 'path\\\\', CAST(1 AS STRING)")
    // identifiers have no backslash escape: \ is an ordinary char
    assert(p.rewrite("SELECT a AS \"x\\\" FROM t, CAST(1 AS VARCHAR)")
      == "SELECT a AS \"x\\\" FROM t, CAST(1 AS STRING)")
  }

  test("TrinoDialectParser double-quote escape rules track the live session conf") {
    // r5 advisory: with doubleQuotedIdentifiers=false (the vanilla
    // default — Engine.session sets it true) Spark parses "..." as a
    // string LITERAL with backslash escapes; the walker must segment
    // the same way or rewrites can fire inside literal data
    import org.apache.spark.sql.internal.SQLConf
    val p = new TrinoDialectParser(null)
    val vanillaConf = new SQLConf
    SQLConf.withExistingConf(vanillaConf) {
      // the escaped quote must NOT close the literal — everything up
      // to the final quote is data, so the cast bait stays untouched
      assert(p.rewrite("SELECT \"it\\\" CAST(1 AS VARCHAR) \" FROM t")
        == "SELECT \"it\\\" CAST(1 AS VARCHAR) \" FROM t")
    }
    val engineConf = new SQLConf
    engineConf.setConfString("spark.sql.ansi.doubleQuotedIdentifiers", "true")
    SQLConf.withExistingConf(engineConf) {
      // identifier semantics: \ is ordinary, the identifier ends at the
      // second quote, and the cast AFTER it is code that must rewrite
      assert(p.rewrite("SELECT \"it\\\" , CAST(1 AS VARCHAR) FROM t")
        == "SELECT \"it\\\" , CAST(1 AS STRING) FROM t")
    }
  }
}
