package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

import graft.Engine

/** The reference's own DuckDB-validated golden suite — the `func/` and
  * `expr/` categories of `tests/expected_results/manifest.json` (53
  * queries; see reference `tests/duckdb_validated.rs:1-80`) — lifted
  * into the driver's value-checked oracle loop as `ref_func_*` /
  * `ref_expr_*` catalog rows.
  *
  * RefParitySpec already proves all 156 manifest queries parse, bind
  * and execute on this engine; these rows upgrade the 53
  * scalar-function/expression queries from execute-verified to
  * hash-verified: the manifest SQL runs VERBATIM through `spark.sql`
  * on the graft session, and the SAME SQL is handed to DuckDB as the
  * oracle. (The remaining manifest categories — tpch, agg, join,
  * subquery, setop, orderby, distinct, basic, complex — are already
  * value-covered by the equivalent `tpch_`, `agg_`, `join_`, `subq_`,
  * `setop_`, `sort_`, `distinct_`, `complex_` catalog rows.)
  *
  * Documented deviations from byte-verbatim, all mechanical:
  *
  *  - ORACLE DIALECT REWRITES (`oracleRewrites`): 8 queries use
  *    Trino-style names DuckDB lacks (3-arg DATE_ADD,
  *    LAST_DAY_OF_MONTH, REGEXP_LIKE, BITWISE_AND/OR/XOR,
  *    BITWISE_LEFT/RIGHT_SHIFT). The Spark side still runs the
  *    manifest text verbatim (the graft Trino registry resolves
  *    them); only the DuckDB oracle gets the equivalent builtin
  *    (`+ INTERVAL`, LAST_DAY, REGEXP_MATCHES, `&`/`|`/xor, `<<`/`>>`)
  *    — same "equivalent ANSI SQL" contract every other catalog row
  *    follows.
  *
  *  - PADDED COLUMNS (`pads`): 4 queries reference `n_comment` /
  *    `s_phone`, which the driver testdata lacks (FIXTURES.md). Both
  *    sides see the same deterministic derived column (the
  *    RefParitySpec padding expressions): Spark pads the temp view
  *    before analysis and restores it after; the oracle prepends a
  *    CTE (`nation_p`) and redirects the FROM — DuckDB forbids a
  *    non-recursive CTE that shadows and reads the same name.
  *
  *  - BOTH-SIDES WRAPPERS (`wrappers`): a handful of queries produce
  *    values that are engine-unstable at the last ULP or in exact
  *    numeric type (double SUM accumulation order, libm CBRT/EXP,
  *    DECIMAL-literal ROUND/FLOOR scale, SIGN's DOUBLE-vs-TINYINT):
  *    those get one outer SELECT applied IDENTICALLY to the Spark
  *    query and the oracle (round to fixed dp / cast), so the check
  *    stays hash-exact without touching the inner manifest text.
  *    Same idiom as the rest of the catalog (QueryCatalog scaladoc).
  *
  * The manifest is read from the reference checkout at runtime — no
  * reference content is vendored into this repo; with no checkout
  * mounted the catalog is empty and every other row is unaffected.
  */
object RefGoldenQueries extends QueryCatalog {

  /** id -> manifest SQL, func/ + expr/ categories only. */
  private lazy val manifest: Seq[(String, String)] =
    RefManifest.loadAll().filter { case (id, _) =>
      id.startsWith("func/") || id.startsWith("expr/")
    }

  /** Deterministic padding for testdata-absent columns: table, column,
    * Spark expr, DuckDB expr (same value, dialect-local spelling). */
  private final case class Pad(table: String, col: String, spark: String, duck: String)

  private val nComment = Pad("nation", "n_comment",
    "concat('nation comment ', cast(n_nationkey as string))",
    "CONCAT('nation comment ', CAST(n_nationkey AS VARCHAR))")
  private val sPhone = Pad("supplier", "s_phone",
    "concat(cast(10 + s_suppkey % 25 as string), '-', lpad(cast(s_suppkey % 10000000 as string), 7, '0'))",
    "CONCAT(CAST(10 + s_suppkey % 25 AS VARCHAR), '-', LPAD(CAST(s_suppkey % 10000000 AS VARCHAR), 7, '0'))")

  private val pads: Map[String, Pad] = Map(
    "func/concat" -> nComment,
    "func/concat_ws" -> nComment,
    "func/split_part" -> sPhone,
    "func/regexp_extract" -> sPhone)

  /** Oracle-only dialect rewrites (literal text replacement). */
  private val oracleRewrites: Map[String, Seq[(String, String)]] = Map(
    "func/date_add" -> Seq(
      "DATE_ADD('day', 30, o_orderdate)" -> "(o_orderdate + INTERVAL 30 DAY)"),
    "func/date_arithmetic" -> Seq(
      "DATE_ADD('year', 1, o_orderdate)" -> "(o_orderdate + INTERVAL 1 YEAR)",
      "DATE_ADD('month', -6, o_orderdate)" -> "(o_orderdate - INTERVAL 6 MONTH)"),
    "func/last_day_of_month" -> Seq("LAST_DAY_OF_MONTH(" -> "LAST_DAY("),
    "func/regexp_like" -> Seq("REGEXP_LIKE(" -> "REGEXP_MATCHES("),
    // DuckDB regexp_replace is first-match unless 'g'; Trino/Spark replace all
    "func/regexp_replace" -> Seq(
      "REGEXP_REPLACE(n_name, '[AEIOU]', '*')" -> "REGEXP_REPLACE(n_name, '[AEIOU]', '*', 'g')"),
    "func/regexp_on_data" -> Seq("REGEXP_LIKE(" -> "REGEXP_MATCHES("),
    "func/bitwise_ops" -> Seq(
      "BITWISE_AND(12, 10)" -> "(12 & 10)",
      "BITWISE_OR(12, 10)" -> "(12 | 10)",
      "BITWISE_XOR(12, 10)" -> "xor(12, 10)"),
    "func/bitwise_shift" -> Seq(
      "BITWISE_LEFT_SHIFT(1, 4)" -> "(1 << 4)",
      "BITWISE_RIGHT_SHIFT(16, 2)" -> "(16 >> 2)"))

  /** Both-sides outer wrappers; `<INNER>` is the manifest SQL. */
  private val wrappers: Map[String, String] = Map(
    // double SUMs: accumulation order differs between engines
    "expr/arithmetic" -> ("SELECT round(total_disc_price, 4) AS total_disc_price, " +
      "round(total_price_tax, 4) AS total_price_tax, " +
      "round(total_double_qty, 4) AS total_double_qty, " +
      "round(total_minus_disc, 4) AS total_minus_disc FROM (<INNER>) t"),
    // DECIMAL-literal ROUND/FLOOR/CEIL: engine-specific result scale
    "expr/math_functions" -> ("SELECT abs_val, CAST(rounded AS DOUBLE) AS rounded, " +
      "CAST(floored AS DOUBLE) AS floored, CAST(ceiled AS DOUBLE) AS ceiled FROM (<INNER>) t"),
    "func/truncate_func" -> ("SELECT CAST(round2 AS DOUBLE) AS round2, " +
      "CAST(round4 AS DOUBLE) AS round4, CAST(round0 AS DOUBLE) AS round0 FROM (<INNER>) t"),
    // SIGN: DOUBLE in Spark, TINYINT in DuckDB
    "func/mod_sign" -> ("SELECT CAST(mod_result AS INT) AS mod_result, " +
      "CAST(neg_sign AS INT) AS neg_sign, CAST(pos_sign AS INT) AS pos_sign, " +
      "CAST(zero_sign AS INT) AS zero_sign FROM (<INNER>) t"),
    // libm last-ULP (DuckDB CBRT(27.0) = 3.0000000000000004)
    "func/power_sqrt" -> ("SELECT round(pow2_10, 6) AS pow2_10, round(sqrt144, 6) AS sqrt144, " +
      "round(cbrt27, 6) AS cbrt27 FROM (<INNER>) t"),
    "func/ln_log_exp" -> ("SELECT round(ln_e, 9) AS ln_e, round(log10_1000, 9) AS log10_1000, " +
      "round(log2_8, 9) AS log2_8, round(exp_1, 9) AS exp_1 FROM (<INNER>) t"),
    "func/trig_functions" -> ("SELECT round(sin0, 9) AS sin0, round(cos0, 9) AS cos0, " +
      "round(tan0, 9) AS tan0, round(asin1, 9) AS asin1, round(acos1, 9) AS acos1 FROM (<INNER>) t"),
    "func/degrees_radians" -> ("SELECT round(deg, 9) AS deg, round(rad, 9) AS rad FROM (<INNER>) t"),
    "func/pi_e" -> ("SELECT round(pi_val, 9) AS pi_val, round(e_val, 9) AS e_val FROM (<INNER>) t"))

  private def wrapped(id: String, sql: String): String =
    wrappers.get(id).map(_.replace("<INNER>", sql)).getOrElse(sql)

  /** Spark side: manifest SQL verbatim (+wrapper); padded queries see a
    * temporarily padded temp view — `spark.sql` analyzes eagerly, so the
    * returned frame captures the padded plan and the view is restored
    * before returning. */
  private def runSpark(id: String, sql: String): (SparkSession, String) => DataFrame = {
    (s, dir) =>
      Engine.registerDir(s, dir)
      val q = wrapped(id, sql)
      pads.get(id) match {
        case None => s.sql(q)
        case Some(p) =>
          graft.sources.ParquetTables.read(s, s"$dir/${p.table}.parquet")
            .withColumn(p.col, expr(p.spark))
            .createOrReplaceTempView(p.table)
          try s.sql(q)
          finally graft.sources.ParquetTables.read(s, s"$dir/${p.table}.parquet")
            .createOrReplaceTempView(p.table)
      }
  }

  /** Oracle side: manifest SQL (+wrapper), dialect rewrites applied, and
    * for padded queries a prepended CTE + FROM redirect. */
  private def oracleFor(id: String, sql: String): String = {
    val rewritten = oracleRewrites.getOrElse(id, Seq.empty)
      .foldLeft(sql) { case (acc, (from, to)) => acc.replace(from, to) }
    val q = wrapped(id, rewritten)
    pads.get(id) match {
      case None => q
      case Some(p) =>
        val redirected = q.replaceAll(s"(?i)\\bFROM\\s+${p.table}\\b", s"FROM ${p.table}_p")
        s"WITH ${p.table}_p AS (SELECT *, ${p.duck} AS ${p.col} FROM ${p.table})\n$redirected"
    }
  }

  lazy val defs: Seq[Q] = manifest.map { case (id, sql) =>
    Q("ref_" + id.replace('/', '_'), Some(oracleFor(id, sql)), runSpark(id, sql))
  }
}
