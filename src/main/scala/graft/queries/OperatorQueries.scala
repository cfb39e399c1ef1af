package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DataTypes

import graft.Engine

/** Relational-operator coverage: one entry per SURVEY §2 row.
  *
  * Mirrors the reference's operator inventory — join types
  * (`src/planner/logical_plan.rs:8-21`), aggregation
  * (`src/physical/operators/hash_agg.rs`), sort/limit/top-k
  * (`sort.rs`, `limit.rs`), set ops (`binder.rs:193-276`), subquery
  * forms (`logical_expr.rs:925-939`) — each expressed Spark-first and
  * checked against DuckDB. Window functions and GROUPING SETS exceed
  * the reference surface (README.md:278 lists windows as unbuilt);
  * they're free on Spark so we cover them too.
  */
object OperatorQueries extends QueryCatalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.t(s, dir, name)

  private def sql(s: SparkSession, dir: String)(q: String): DataFrame = {
    Engine.registerDir(s, dir)
    s.sql(q)
  }

  private def dsum(c: Column) =
    sum(c.cast(DataTypes.createDecimalType(18, 6))).cast("double")

  // ---------------------------------------------------------------- scans

  /** Projection + filter pushdown to the parquet scan (reference
    * ParquetTable projection pushdown, storage/parquet.rs:26-327, and
    * row-group pruning, row_group_pruning.rs). `.explain` shows
    * ReadSchema with only two columns and PushedFilters on o_totalprice. */
  private val scanProjection = Q(
    "scan_projection",
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 495000
      ORDER BY o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
        .filter(col("o_totalprice") > 495000)
        .orderBy(col("o_orderkey")))

  /** In-memory table (reference MemoryTableExec, scan.rs:100-258):
    * driver-local rows parallelized across partitions. */
  private val scanMemory = Q(
    "scan_memory",
    Some("""
      SELECT x, x * x AS sq FROM (VALUES (1), (2), (3), (4), (5)) AS t(x)
      ORDER BY x"""),
    (s, _) => {
      import s.implicits._
      Seq(1, 2, 3, 4, 5).toDF("x")
        .select(col("x"), (col("x") * col("x")).as("sq"))
        .orderBy(col("x"))
    })

  /** Per-JVM scratch root for the source-format roundtrip rows (same
    * pattern as IcebergQueries.appendRoot): a fixed cross-process path
    * derived from the sf dir would let two concurrent catalog runs
    * overwrite/delete each other's files mid-read. */
  private lazy val roundtripRoot =
    java.nio.file.Files.createTempDirectory("graft_roundtrip").toString

  /** Parquet write + re-read roundtrip (reference ParquetWriter,
    * physical/operators/parquet.rs). */
  private val scanWriteRoundtrip = Q(
    "scan_write_roundtrip",
    Some("""
      SELECT count(*) AS n, count(DISTINCT n_nationkey) AS nk FROM nation"""),
    (s, dir) => {
      val out = s"$roundtripRoot/parquet_${dir.hashCode}"
      t(s, dir, "nation").write.mode("overwrite").parquet(out)
      s.read.parquet(out)
        .agg(count(lit(1)).as("n"), countDistinct(col("n_nationkey")).as("nk"))
    })

  /** CSV write + schema'd re-read roundtrip (➕ source format beyond
    * the reference, which reads parquet/iceberg only — SURVEY §2.1).
    * Full row contents verified, not just counts: the oracle reads the
    * original parquet, so any type/quoting/null loss in the CSV hop
    * flips the hash. Explicit schema on re-read (CSV carries none). */
  private val scanCsvRoundtrip = Q(
    "scan_csv_roundtrip",
    Some("SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey"),
    (s, dir) => {
      val src = t(s, dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
      val out = s"$roundtripRoot/csv_${dir.hashCode}"
      src.write.mode("overwrite").option("header", "true").csv(out)
      s.read.schema(src.schema).option("header", "true").csv(out)
        .orderBy(col("n_nationkey"))
    })

  /** JSON-lines write + re-read roundtrip (➕ likewise absent in the
    * reference). Same oracle shape: parquet truth vs the JSON hop. */
  private val scanJsonRoundtrip = Q(
    "scan_json_roundtrip",
    Some("SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"),
    (s, dir) => {
      val src = t(s, dir, "region").select("r_regionkey", "r_name")
      val out = s"$roundtripRoot/json_${dir.hashCode}"
      src.write.mode("overwrite").json(out)
      s.read.schema(src.schema).json(out)
        .orderBy(col("r_regionkey"))
    })

  // ---------------------------------------------------------------- joins

  /** Inner equi-join (reference HashJoinExec Inner, hash_join.rs:172). */
  private val joinInner = Q(
    "join_inner",
    Some("""
      SELECT o_orderkey, o_totalprice, c_name
      FROM orders JOIN customer ON o_custkey = c_custkey
      WHERE o_totalprice > 480000
      ORDER BY o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_totalprice") > 480000)
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .select(col("o_orderkey"), col("o_totalprice"), col("c_name"))
        .orderBy(col("o_orderkey")))

  /** Left outer join with join-condition filter (unmatched rows kept). */
  private val joinLeft = Q(
    "join_left",
    Some("""
      SELECT c_custkey, o_orderkey
      FROM customer LEFT JOIN orders
        ON c_custkey = o_custkey AND o_totalprice > 490000
      WHERE c_custkey < 100
      ORDER BY c_custkey, o_orderkey"""),
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 490000)
      t(s, dir, "customer").filter(col("c_custkey") < 100)
        .join(o, col("c_custkey") === col("o_custkey"), "left_outer")
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey"))
    })

  /** Right outer join (reference hash_join.rs Right, unmatched-build
    * emission :1809-1828). */
  private val joinRight = Q(
    "join_right",
    Some("""
      SELECT c_custkey, o_orderkey
      FROM orders RIGHT JOIN customer
        ON c_custkey = o_custkey AND o_totalprice > 490000
      WHERE c_custkey < 100
      ORDER BY c_custkey, o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_totalprice") > 490000)
        .join(t(s, dir, "customer"), col("c_custkey") === col("o_custkey"), "right_outer")
        .filter(col("c_custkey") < 100)
        .select(col("c_custkey"), col("o_orderkey"))
        .orderBy(col("c_custkey"), col("o_orderkey")))

  /** Full outer join of two aggregated sides. */
  private val joinFull = Q(
    "join_full",
    Some("""
      SELECT cn.nk AS c_nk, sn.nk AS s_nk, cn.n_cust, sn.n_supp
      FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
            WHERE c_nationkey < 15 GROUP BY c_nationkey) cn
      FULL OUTER JOIN
           (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
            WHERE s_nationkey > 10 GROUP BY s_nationkey) sn
        ON cn.nk = sn.nk
      ORDER BY c_nk NULLS FIRST, s_nk NULLS FIRST"""),
    (s, dir) => {
      val cn = t(s, dir, "customer").filter(col("c_nationkey") < 15)
        .groupBy(col("c_nationkey").as("nk")).agg(count(lit(1)).as("n_cust"))
      val sn = t(s, dir, "supplier").filter(col("s_nationkey") > 10)
        .groupBy(col("s_nationkey").as("nk")).agg(count(lit(1)).as("n_supp"))
      cn.join(sn, cn("nk") === sn("nk"), "full_outer")
        .select(cn("nk").as("c_nk"), sn("nk").as("s_nk"), col("n_cust"), col("n_supp"))
        .orderBy(col("c_nk").asc_nulls_first, col("s_nk").asc_nulls_first)
    })

  /** Left semi join — EXISTS shape (reference Semi, planner :675-692). */
  private val joinSemi = Q(
    "join_semi",
    Some("""
      SELECT c_custkey, c_name FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_totalprice > 490000)
      ORDER BY c_custkey"""),
    (s, dir) => {
      val o = t(s, dir, "orders").filter(col("o_totalprice") > 490000)
      t(s, dir, "customer")
        .join(o, col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
        .orderBy(col("c_custkey"))
    })

  /** Left anti join — NOT EXISTS shape. */
  private val joinAnti = Q(
    "join_anti",
    Some("""
      SELECT s_suppkey, s_name FROM supplier
      WHERE NOT EXISTS (SELECT 1 FROM lineitem
                        WHERE l_suppkey = s_suppkey
                          AND l_shipdate > TIMESTAMP '2001-01-01 00:00:00')
      ORDER BY s_suppkey"""),
    (s, dir) => {
      val l = t(s, dir, "lineitem")
        .filter(col("l_shipdate") > to_timestamp_ntz(lit("2001-01-01 00:00:00")))
      t(s, dir, "supplier")
        .join(l, col("l_suppkey") === col("s_suppkey"), "left_anti")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy(col("s_suppkey"))
    })

  /** Cross join (reference Cross, logical_plan.rs:8-21). */
  private val joinCross = Q(
    "join_cross",
    Some("""
      SELECT r_name, seg
      FROM region CROSS JOIN (SELECT DISTINCT c_mktsegment AS seg FROM customer) s
      ORDER BY r_name, seg"""),
    (s, dir) => {
      val segs = t(s, dir, "customer").select(col("c_mktsegment").as("seg")).distinct()
      t(s, dir, "region").crossJoin(segs)
        .select(col("r_name"), col("seg"))
        .orderBy(col("r_name"), col("seg"))
    })

  /** Self join (same-order line pairs from one supplier). */
  private val joinSelf = Q(
    "join_self",
    Some("""
      SELECT count(*) AS pairs
      FROM lineitem l1 JOIN lineitem l2
        ON l1.l_orderkey = l2.l_orderkey
       AND l1.l_linenumber < l2.l_linenumber
       AND l1.l_suppkey = l2.l_suppkey"""),
    (s, dir) => {
      val l1 = t(s, dir, "lineitem").select(
        col("l_orderkey").as("k1"), col("l_linenumber").as("n1"), col("l_suppkey").as("s1"))
      val l2 = t(s, dir, "lineitem").select(
        col("l_orderkey").as("k2"), col("l_linenumber").as("n2"), col("l_suppkey").as("s2"))
      l1.join(l2, col("k1") === col("k2") && col("n1") < col("n2") && col("s1") === col("s2"))
        .agg(count(lit(1)).as("pairs"))
    })

  /** Equi-join with non-equi residual (reference CompiledFilter fast
    * path, hash_join.rs:812-870). */
  private val joinInequality = Q(
    "join_inequality",
    Some("""
      SELECT count(*) AS n
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal"""),
    (s, dir) =>
      t(s, dir, "supplier")
        .join(t(s, dir, "customer"),
          col("s_nationkey") === col("c_nationkey") && col("s_acctbal") > col("c_acctbal"))
        .agg(count(lit(1)).as("n")))

  /** Pure-inequality join → broadcast nested loop (reference binds these
    * as Cross+Filter, binder.rs:569-621). */
  private val joinRange = Q(
    "join_range",
    Some("""
      SELECT r1.r_name AS a, r2.r_name AS b
      FROM region r1 JOIN region r2 ON r1.r_regionkey < r2.r_regionkey
      ORDER BY a, b"""),
    (s, dir) => {
      val r1 = t(s, dir, "region").select(col("r_regionkey").as("k1"), col("r_name").as("a"))
      val r2 = t(s, dir, "region").select(col("r_regionkey").as("k2"), col("r_name").as("b"))
      r1.join(r2, col("k1") < col("k2")).select(col("a"), col("b")).orderBy(col("a"), col("b"))
    })

  /** As-of join ➕ (absent in the reference; kdb/pandas/DuckDB staple):
    * for each click, the most recent prior view by the same user.
    * Implemented shuffle-once via union+window (operators/AsOf) — the
    * oracle is DuckDB's native ASOF LEFT JOIN. */
  private val joinAsof = Q(
    "join_asof",
    Some("""
      SELECT c.event_id, c.user_id, c.ts,
             v.event_id AS view_event_id, v.value AS view_value, v.ts AS view_ts
      FROM (SELECT * FROM events WHERE event_type = 'click') c
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'view') v
        ON c.user_id = v.user_id AND c.ts >= v.ts
      ORDER BY c.event_id"""),
    (s, dir) => {
      val ev = t(s, dir, "events")
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts"), col("event_id"), col("value"))
      graft.operators.AsOf.join(clicks, views, Seq("user_id"), "ts", "ts")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("event_id_r").as("view_event_id"),
          col("value_r").as("view_value"),
          col("ts_r").as("view_ts"))
        .orderBy(col("event_id"))
    })

  // ----------------------------------------------------------- aggregates

  /** COUNT/COUNT DISTINCT/SUM/AVG/MIN/MAX (hash_agg.rs:2002+). */
  private val aggBasic = Q(
    "agg_basic",
    Some("""
      SELECT l_returnflag, count(*) AS n, count(DISTINCT l_suppkey) AS n_supp,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_qty,
             round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS DOUBLE) / count(*), 4) AS avg_price,
             min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          countDistinct(col("l_suppkey")).as("n_supp"),
          round(dsum(col("l_quantity")), 2).as("sum_qty"),
          round(dsum(col("l_extendedprice")) / count(lit(1)), 4).as("avg_price"),
          min(col("l_shipdate")).as("first_ship"),
          max(col("l_shipdate")).as("last_ship"))
        .orderBy(col("l_returnflag")))

  /** SUM DISTINCT (quantity is integral → exact). */
  private val aggDistinct = Q(
    "agg_distinct",
    Some("""
      SELECT l_linestatus, round(sum(DISTINCT l_quantity), 2) AS sum_dq,
             count(DISTINCT l_partkey) AS n_parts
      FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_linestatus"))
        .agg(
          round(sum_distinct(col("l_quantity")), 2).as("sum_dq"),
          countDistinct(col("l_partkey")).as("n_parts"))
        .orderBy(col("l_linestatus")))

  /** STDDEV/VARIANCE family (hash_agg.rs enum :176-223). */
  private val aggStats = Q(
    "agg_stats",
    Some("""
      SELECT l_returnflag,
             round(stddev_samp(l_quantity), 4) AS sd_samp,
             round(stddev_pop(l_quantity), 4) AS sd_pop,
             round(var_samp(l_quantity), 4) AS v_samp,
             round(var_pop(l_quantity), 4) AS v_pop
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd_samp"),
          round(stddev_pop(col("l_quantity")), 4).as("sd_pop"),
          round(var_samp(col("l_quantity")), 4).as("v_samp"),
          round(var_pop(col("l_quantity")), 4).as("v_pop"))
        .orderBy(col("l_returnflag")))

  /** BOOL_AND/BOOL_OR/COUNT_IF (hash_agg COUNT_IF/BOOL_* variants). */
  private val aggBool = Q(
    "agg_bool",
    Some("""
      SELECT event_type,
             bool_and(value > 0) AS all_pos,
             bool_or(value > 90) AS any_big,
             count(*) FILTER (WHERE value > 50) AS n_over_50
      FROM events GROUP BY event_type ORDER BY event_type"""),
    (s, dir) =>
      t(s, dir, "events").groupBy(col("event_type"))
        .agg(
          bool_and(col("value") > 0).as("all_pos"),
          bool_or(col("value") > 90).as("any_big"),
          count_if(col("value") > 50).as("n_over_50"))
        .orderBy(col("event_type")))

  /** MAX_BY/MIN_BY (hash_agg.rs:340-344); ANY_VALUE on a functionally
    * dependent column (deterministic). */
  private val aggMinmaxBy = Q(
    "agg_minmax_by",
    Some("""
      SELECT o_orderpriority,
             max_by(o_totalprice, o_orderkey) AS price_of_last,
             min_by(o_totalprice, o_orderkey) AS price_of_first
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(
          max_by(col("o_totalprice"), col("o_orderkey")).as("price_of_last"),
          min_by(col("o_totalprice"), col("o_orderkey")).as("price_of_first"))
        .orderBy(col("o_orderpriority")))

  /** BITWISE_AND/OR/XOR_AGG (hash_agg BITWISE_*_AGG). */
  private val aggBitwise = Q(
    "agg_bitwise",
    Some("""
      SELECT l_returnflag,
             bit_and(l_linenumber) AS band,
             bit_or(l_linenumber) AS bor,
             bit_xor(l_linenumber) AS bxor
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          bit_and(col("l_linenumber")).as("band"),
          bit_or(col("l_linenumber")).as("bor"),
          bit_xor(col("l_linenumber")).as("bxor"))
        .orderBy(col("l_returnflag")))

  /** LISTAGG (hash_agg.rs:1689) — deterministic via sorted distinct set. */
  private val aggListagg = Q(
    "agg_listagg",
    Some("""
      SELECT o_orderpriority,
             string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus) AS statuses
      FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"""),
    (s, dir) =>
      t(s, dir, "orders").groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",").as("statuses"))
        .orderBy(col("o_orderpriority")))

  /** CORR/COVAR_POP/COVAR_SAMP (hash_agg CORR/COVAR_*). */
  private val aggCorr = Q(
    "agg_corr",
    Some("""
      SELECT l_returnflag,
             round(corr(l_extendedprice, l_quantity), 4) AS r,
             round(covar_pop(l_extendedprice, l_quantity), 2) AS cp,
             round(covar_samp(l_extendedprice, l_quantity), 2) AS cs
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(corr(col("l_extendedprice"), col("l_quantity")), 4).as("r"),
          round(covar_pop(col("l_extendedprice"), col("l_quantity")), 2).as("cp"),
          round(covar_samp(col("l_extendedprice"), col("l_quantity")), 2).as("cs"))
        .orderBy(col("l_returnflag")))

  /** SKEWNESS/KURTOSIS. Spark computes population g1 / excess-g2; DuckDB's
    * skewness is bias-corrected sample and kurtosis_pop matches g2 — the
    * oracle undoes the correction algebraically. */
  private val aggSkewKurt = Q(
    "agg_skew_kurt",
    Some("""
      SELECT l_returnflag,
             round(skewness(l_quantity) * (count(*) - 2) / sqrt(count(*) * (count(*) - 1.0)), 4) AS skew,
             round(kurtosis_pop(l_quantity), 4) AS kurt
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(skewness(col("l_quantity")), 4).as("skew"),
          round(kurtosis(col("l_quantity")), 4).as("kurt"))
        .orderBy(col("l_returnflag")))

  /** REGR_* linear-regression aggregates (hash_agg REGR_*). */
  private val aggRegr = Q(
    "agg_regr",
    Some("""
      SELECT l_returnflag,
             round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
             round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
             regr_count(l_extendedprice, l_quantity) AS n,
             round(regr_avgx(l_extendedprice, l_quantity), 4) AS ax,
             round(regr_avgy(l_extendedprice, l_quantity), 4) AS ay
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(regr_slope(col("l_extendedprice"), col("l_quantity")), 4).as("slope"),
          round(regr_intercept(col("l_extendedprice"), col("l_quantity")), 4).as("icept"),
          regr_count(col("l_extendedprice"), col("l_quantity")).as("n"),
          round(regr_avgx(col("l_extendedprice"), col("l_quantity")), 4).as("ax"),
          round(regr_avgy(col("l_extendedprice"), col("l_quantity")), 4).as("ay"))
        .orderBy(col("l_returnflag")))

  /** Percentiles — reference APPROX_PERCENTILE is *exact* sort-based
    * (hash_agg.rs:1753-1785), so we use Spark's exact `percentile`
    * (matches DuckDB quantile_cont) and `median`. */
  private val aggPercentile = Q(
    "agg_percentile",
    Some("""
      SELECT l_returnflag,
             round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
             round(quantile_cont(l_extendedprice, 0.95), 4) AS p95,
             round(median(l_extendedprice), 4) AS med
      FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
    (s, dir) =>
      t(s, dir, "lineitem").groupBy(col("l_returnflag"))
        .agg(
          round(percentile(col("l_extendedprice"), lit(0.5)), 4).as("p50"),
          round(percentile(col("l_extendedprice"), lit(0.95)), 4).as("p95"),
          round(median(col("l_extendedprice")), 4).as("med"))
        .orderBy(col("l_returnflag")))

  /** ANY_VALUE over a functionally-dependent column (deterministic). */
  private val aggAnyValue = Q(
    "agg_any_value",
    Some("""
      SELECT n_nationkey, any_value(n_name) AS name
      FROM nation GROUP BY n_nationkey ORDER BY n_nationkey"""),
    (s, dir) =>
      t(s, dir, "nation").groupBy(col("n_nationkey"))
        .agg(any_value(col("n_name")).as("name"))
        .orderBy(col("n_nationkey")))

  /** ROLLUP (exceeds reference — binder.rs:1019-1023 rejects these). */
  private val aggRollup = Q(
    "agg_rollup",
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS sq
      FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    (s, dir) =>
      t(s, dir, "lineitem").rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), round(dsum(col("l_quantity")), 2).as("sq"))
        .orderBy(col("l_returnflag").asc_nulls_first, col("l_linestatus").asc_nulls_first))

  /** CUBE (exceeds reference). */
  private val aggCube = Q(
    "agg_cube",
    Some("""
      SELECT o_orderstatus, o_orderpriority, count(*) AS n
      FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
      ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST"""),
    (s, dir) =>
      t(s, dir, "orders").cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first))

  /** GROUPING SETS via SQL (exceeds reference). */
  private val aggGroupingSets = Q(
    "agg_grouping_sets",
    Some("""
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""),
    (s, dir) => sql(s, dir)("""
      SELECT l_returnflag, l_linestatus, count(*) AS n
      FROM lineitem
      GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST"""))

  /** Global (no GROUP BY) scalar aggregate — reference SIMD scalar-agg
    * path (hash_agg.rs:392-415). */
  private val aggGlobal = Q(
    "agg_global",
    Some("""
      SELECT count(*) AS n, min(o_orderdate) AS first_o, max(o_orderdate) AS last_o,
             min(o_orderstatus) AS min_st, max(o_orderstatus) AS max_st
      FROM orders"""),
    (s, dir) =>
      t(s, dir, "orders").agg(
        count(lit(1)).as("n"),
        min(col("o_orderdate")).as("first_o"),
        max(col("o_orderdate")).as("last_o"),
        min(col("o_orderstatus")).as("min_st"),
        max(col("o_orderstatus")).as("max_st")))

  // -------------------------------------------------- sort / limit / topk

  /** Multi-key sort with explicit direction + null placement (reference
    * SortExpr defaults NULLS FIRST both directions, logical_expr.rs:813-825). */
  private val sortMulti = Q(
    "sort_multi",
    Some("""
      SELECT l_orderkey, l_linenumber, l_returnflag, l_quantity
      FROM lineitem
      ORDER BY l_returnflag DESC, l_quantity ASC, l_orderkey, l_linenumber
      LIMIT 50"""),
    (s, dir) =>
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity"))
        .orderBy(col("l_returnflag").desc, col("l_quantity").asc,
          col("l_orderkey"), col("l_linenumber"))
        .limit(50))

  /** NULLS FIRST placement on a computed nullable key. */
  private val sortNulls = Q(
    "sort_nulls",
    Some("""
      SELECT o_orderkey, nullif(o_orderstatus, 'O') AS st
      FROM orders WHERE o_orderkey < 200
      ORDER BY st NULLS FIRST, o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"), nullif(col("o_orderstatus"), lit("O")).as("st"))
        .orderBy(col("st").asc_nulls_first, col("o_orderkey")))

  /** OFFSET + LIMIT (reference LimitExec skip/fetch, limit.rs:13-194). */
  private val limitOffset = Q(
    "limit_offset",
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_orderkey LIMIT 20 OFFSET 10"""),
    (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_orderkey")).offset(10).limit(20))

  /** Top-K — Catalyst fuses to TakeOrderedAndProject (reference Sort-with-
    * fetch fusion, planner.rs:835-865). */
  private val topk = Q(
    "topk",
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 5"""),
    (s, dir) =>
      t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey")).limit(5))

  /** DISTINCT (reference rewrites to group-by-all, planner.rs:867-892). */
  private val distinctRows = Q(
    "distinct_rows",
    Some("""
      SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
      ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) =>
      t(s, dir, "lineitem").select(col("l_returnflag"), col("l_linestatus"))
        .distinct().orderBy(col("l_returnflag"), col("l_linestatus")))

  // -------------------------------------------------------------- set ops

  private val setopUnionAll = Q(
    "setop_union_all",
    Some("""
      SELECT c_custkey AS id FROM customer WHERE c_acctbal > 9900
      UNION ALL
      SELECT s_suppkey FROM supplier WHERE s_acctbal > 9000
      ORDER BY id"""),
    (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9900).select(col("c_custkey").as("id"))
        .unionAll(t(s, dir, "supplier").filter(col("s_acctbal") > 9000).select(col("s_suppkey")))
        .orderBy(col("id")))

  private val setopUnion = Q(
    "setop_union",
    Some("""
      SELECT c_nationkey AS nk FROM customer
      UNION
      SELECT s_nationkey FROM supplier
      ORDER BY nk"""),
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .union(t(s, dir, "supplier").select(col("s_nationkey")))
        .distinct().orderBy(col("nk")))

  private val setopIntersect = Q(
    "setop_intersect",
    Some("""
      SELECT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000
      INTERSECT
      SELECT s_nationkey FROM supplier
      ORDER BY nk"""),
    (s, dir) =>
      t(s, dir, "customer").filter(col("c_acctbal") > 9000).select(col("c_nationkey").as("nk"))
        .intersect(t(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nk")))

  private val setopIntersectAll = Q(
    "setop_intersect_all",
    Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity = 1
      INTERSECT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity = 2
      ORDER BY k"""),
    (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_quantity") === 1).select(col("l_suppkey").as("k"))
        .intersectAll(t(s, dir, "lineitem").filter(col("l_quantity") === 2).select(col("l_suppkey")))
        .orderBy(col("k")))

  private val setopExcept = Q(
    "setop_except",
    Some("""
      SELECT c_nationkey AS nk FROM customer
      EXCEPT
      SELECT s_nationkey FROM supplier
      ORDER BY nk"""),
    (s, dir) =>
      t(s, dir, "customer").select(col("c_nationkey").as("nk"))
        .except(t(s, dir, "supplier").select(col("s_nationkey")))
        .orderBy(col("nk")))

  private val setopExceptAll = Q(
    "setop_except_all",
    Some("""
      SELECT l_suppkey AS k FROM lineitem WHERE l_quantity = 1
      EXCEPT ALL
      SELECT l_suppkey FROM lineitem WHERE l_quantity = 2
      ORDER BY k"""),
    (s, dir) =>
      t(s, dir, "lineitem").filter(col("l_quantity") === 1).select(col("l_suppkey").as("k"))
        .exceptAll(t(s, dir, "lineitem").filter(col("l_quantity") === 2).select(col("l_suppkey")))
        .orderBy(col("k")))

  // ------------------------------------------------------------ subqueries

  /** Uncorrelated scalar subquery (reference pre-computes to literal,
    * planner.rs:144-290). */
  private val subqScalar = Q(
    "subq_scalar",
    Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.9 * (SELECT avg(o_totalprice) FROM orders)
      ORDER BY o_orderkey"""))

  /** IN subquery → semi join (subquery_decorrelation.rs:375). */
  private val subqIn = Q(
    "subq_in",
    Some("""
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < -900)
      ORDER BY o_orderkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT o_orderkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal < -900)
      ORDER BY o_orderkey"""))

  /** NOT IN subquery → anti join (null-aware). */
  private val subqNotIn = Q(
    "subq_not_in",
    Some("""
      SELECT s_suppkey FROM supplier
      WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      ORDER BY s_suppkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT s_suppkey FROM supplier
      WHERE s_nationkey NOT IN (SELECT n_nationkey FROM nation WHERE n_regionkey = 0)
      ORDER BY s_suppkey"""))

  /** Correlated scalar subquery in the SELECT list (reference
    * SubqueryExecutor path, subquery.rs:47-70). */
  private val subqScalarSelect = Q(
    "subq_scalar_select",
    Some("""
      SELECT o_orderkey,
             (SELECT max(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line
      FROM orders WHERE o_orderkey < 100
      ORDER BY o_orderkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT o_orderkey,
             (SELECT max(l_extendedprice) FROM lineitem WHERE l_orderkey = o_orderkey) AS max_line
      FROM orders WHERE o_orderkey < 100
      ORDER BY o_orderkey"""))

  /** Nested subquery: IN over EXISTS. */
  private val subqNested = Q(
    "subq_nested",
    Some("""
      SELECT c_custkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 450000
                            AND EXISTS (SELECT 1 FROM lineitem
                                        WHERE l_orderkey = o_orderkey AND l_quantity = 50))
      ORDER BY c_custkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT c_custkey FROM customer
      WHERE c_custkey IN (SELECT o_custkey FROM orders
                          WHERE o_totalprice > 450000
                            AND EXISTS (SELECT 1 FROM lineitem
                                        WHERE l_orderkey = o_orderkey AND l_quantity = 50))
      ORDER BY c_custkey"""))

  // ------------------------------------------------------------------ CTEs

  /** Chained CTEs (reference binds CTEs first, binder.rs:166-176). */
  private val cteChained = Q(
    "cte_chained",
    Some("""
      WITH big AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000),
           per_cust AS (SELECT o_custkey, count(*) AS n_big FROM big GROUP BY o_custkey)
      SELECT n_big, count(*) AS n_cust FROM per_cust
      GROUP BY n_big ORDER BY n_big"""),
    (s, dir) => sql(s, dir)("""
      WITH big AS (SELECT o_custkey, o_totalprice FROM orders WHERE o_totalprice > 400000),
           per_cust AS (SELECT o_custkey, count(*) AS n_big FROM big GROUP BY o_custkey)
      SELECT n_big, count(*) AS n_cust FROM per_cust
      GROUP BY n_big ORDER BY n_big"""))

  // -------------------------------------------------------------- complex
  // (mirrors the reference's golden `complex/` category: CTEs + unions +
  //  deep nesting, tests/expected_results/ — SURVEY §5)

  /** Union of two aggregates inside a CTE, joined back to a dimension. */
  private val complexUnionCte = Q(
    "complex_union_cte",
    Some("""
      WITH balances AS (
        SELECT c_nationkey AS nk, 'customer' AS side,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS bal
        FROM customer GROUP BY c_nationkey
        UNION ALL
        SELECT s_nationkey, 'supplier',
               round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2)
        FROM supplier GROUP BY s_nationkey)
      SELECT n_name, side, bal
      FROM balances JOIN nation ON nk = n_nationkey
      WHERE bal > 0
      ORDER BY n_name, side"""),
    (s, dir) => sql(s, dir)("""
      WITH balances AS (
        SELECT c_nationkey AS nk, 'customer' AS side,
               round(CAST(sum(CAST(c_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2) AS bal
        FROM customer GROUP BY c_nationkey
        UNION ALL
        SELECT s_nationkey, 'supplier',
               round(CAST(sum(CAST(s_acctbal AS DECIMAL(18,6))) AS DOUBLE), 2)
        FROM supplier GROUP BY s_nationkey)
      SELECT n_name, side, bal
      FROM balances JOIN nation ON nk = n_nationkey
      WHERE bal > 0
      ORDER BY n_name, side"""))

  /** Deeply nested derived tables with a correlated predicate at the
    * innermost level. */
  private val complexNested = Q(
    "complex_nested",
    Some("""
      SELECT priority, n_orders, round(avg_price, 2) AS avg_price
      FROM (SELECT priority, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
            FROM (SELECT o_orderpriority AS priority, o_totalprice
                  FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM customer
                                      WHERE c_mktsegment = 'BUILDING')) x
            GROUP BY priority) y
      WHERE n_orders > 10
      ORDER BY priority"""),
    (s, dir) => sql(s, dir)("""
      SELECT priority, n_orders, round(avg_price, 2) AS avg_price
      FROM (SELECT priority, count(*) AS n_orders,
                   CAST(sum(CAST(o_totalprice AS DECIMAL(18,6))) AS DOUBLE) / count(*) AS avg_price
            FROM (SELECT o_orderpriority AS priority, o_totalprice
                  FROM orders
                  WHERE o_custkey IN (SELECT c_custkey FROM customer
                                      WHERE c_mktsegment = 'BUILDING')) x
            GROUP BY priority) y
      WHERE n_orders > 10
      ORDER BY priority"""))

  /** CTE feeding a window function feeding a HAVING-style filter. */
  private val complexCteWindow = Q(
    "complex_cte_window",
    Some("""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT day, event_type, n, rnk
      FROM (SELECT day, event_type, n,
                   rank() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rnk
            FROM daily) x
      WHERE rnk <= 2
      ORDER BY day, rnk, event_type"""),
    (s, dir) => sql(s, dir)("""
      WITH daily AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n
        FROM events GROUP BY 1, 2)
      SELECT day, event_type, n, rnk
      FROM (SELECT day, event_type, n,
                   rank() OVER (PARTITION BY day ORDER BY n DESC, event_type) AS rnk
            FROM daily) x
      WHERE rnk <= 2
      ORDER BY day, rnk, event_type"""))

  /** Expression soup: arithmetic/boolean/comparison precedence + CASE
    * nesting (mirrors golden `expr/` category). */
  private val complexExpr = Q(
    "complex_expr",
    Some("""
      SELECT o_orderkey,
             (o_totalprice + 10) * 2 - o_orderkey % 7 AS arith,
             NOT (o_totalprice > 250000 AND o_orderstatus = 'F')
                 OR o_orderkey % 2 = 0 AS boolexpr,
             CASE WHEN o_totalprice BETWEEN 100000 AND 300000
                  THEN CASE o_orderstatus WHEN 'F' THEN 'mid-f' ELSE 'mid-x' END
                  ELSE 'out' END AS nested_case,
             o_orderkey BETWEEN 50 AND 150 AS in_range,
             o_orderstatus IN ('F', 'P') AND o_orderpriority NOT IN ('5-LOW') AS multi_in
      FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 200)
        .select(col("o_orderkey"),
          ((col("o_totalprice") + 10) * 2 - col("o_orderkey") % 7).as("arith"),
          (!(col("o_totalprice") > 250000 && col("o_orderstatus") === "F") ||
            col("o_orderkey") % 2 === 0).as("boolexpr"),
          when(col("o_totalprice").between(100000, 300000),
            when(col("o_orderstatus") === "F", "mid-f").otherwise("mid-x"))
            .otherwise("out").as("nested_case"),
          col("o_orderkey").between(50, 150).as("in_range"),
          (col("o_orderstatus").isin("F", "P") &&
            !col("o_orderpriority").isin("5-LOW")).as("multi_in"))
        .orderBy(col("o_orderkey")))

  // --------------------------------------------------------------- window

  /** ROW_NUMBER/RANK/DENSE_RANK (exceeds reference — README.md:278). */
  private val windowRank = Q(
    "window_rank",
    Some("""
      SELECT * FROM (
        SELECT o_orderpriority, o_orderkey, o_totalprice,
               row_number() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn,
               rank() OVER (PARTITION BY o_orderpriority ORDER BY o_orderstatus) AS rk
        FROM orders) x
      WHERE rn <= 3
      ORDER BY o_orderpriority, rn"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byPrice = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val byStatus = Window.partitionBy(col("o_orderpriority"))
        .orderBy(col("o_orderstatus"))
      t(s, dir, "orders")
        .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
          row_number().over(byPrice).as("rn"),
          rank().over(byStatus).as("rk"))
        .filter(col("rn") <= 3)
        .orderBy(col("o_orderpriority"), col("rn"))
    })

  /** Full window-function surface: lead/lag/first/nth/ntile/
    * percent_rank/cume_dist + a value-RANGE frame (peer-inclusive
    * count of orders within $1000 below the current price). All
    * deterministic: partitions order by the unique o_orderkey, and the
    * RANGE frame is value-defined so duplicates don't reorder it. */
  private val windowFrames = Q(
    "window_frames",
    Some("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             first_value(o_totalprice) OVER wf AS first_price,
             nth_value(o_totalprice, 2) OVER wf AS second_price,
             CAST(ntile(4) OVER (ORDER BY o_orderkey) AS INT) AS quartile,
             round(percent_rank() OVER (ORDER BY o_orderkey), 6) AS pr,
             round(cume_dist() OVER (ORDER BY o_orderkey), 6) AS cd,
             count(*) OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS near_below
      FROM orders
      WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""),
    (s, dir) => sql(s, dir)("""
      SELECT o_custkey, o_orderkey, o_totalprice,
             lag(o_totalprice) OVER w AS prev_price,
             lead(o_totalprice) OVER w AS next_price,
             first_value(o_totalprice) OVER wf AS first_price,
             nth_value(o_totalprice, 2) OVER wf AS second_price,
             ntile(4) OVER (ORDER BY o_orderkey) AS quartile,
             round(percent_rank() OVER (ORDER BY o_orderkey), 6) AS pr,
             round(cume_dist() OVER (ORDER BY o_orderkey), 6) AS cd,
             count(*) OVER (ORDER BY o_totalprice
                            RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW) AS near_below
      FROM orders
      WHERE o_custkey < 30
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey),
             wf AS (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      ORDER BY o_custkey, o_orderkey"""))

  /** Running aggregate + LAG over event time (exceeds reference). */
  private val windowRunning = Q(
    "window_running",
    Some("""
      SELECT event_id,
             round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running,
             lag(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
      FROM events WHERE user_id < 20
      ORDER BY event_id"""),
    (s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, dir, "events").filter(col("user_id") < 20)
        .select(col("event_id"),
          round(sum(col("value")).over(w.rowsBetween(Window.unboundedPreceding, 0)), 4).as("running"),
          lag(col("event_type"), 1).over(w).as("prev_type"))
        .orderBy(col("event_id"))
    })

  // ------------------------------------------------------- events (batch time ops)

  /** date_trunc time-bucket aggregation over the events table (the
    * reference's only "time" workload shape — batch, SURVEY §2.10). */
  private val eventsTimeBucket = Q(
    "events_time_bucket",
    Some("""
      SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
      FROM events
      GROUP BY date_trunc('day', ts), event_type
      ORDER BY day, event_type"""),
    (s, dir) =>
      t(s, dir, "events")
        .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(dsum(col("value")), 2).as("sum_value"))
        .orderBy(col("day"), col("event_type")))

  /** Salted two-stage aggregation must produce EXACTLY groupBy(key)
    * semantics — the oracle is the plain GROUP BY (Skew.saltedCountSum;
    * decimal accumulation makes the partial-sum order irrelevant, so
    * the salt layout cannot perturb the hash). */
  private val aggSkewSalted = Q(
    "agg_skew_salted",
    Some("""
      SELECT l_returnflag AS k, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS s
      FROM lineitem GROUP BY l_returnflag ORDER BY k"""),
    (s, dir) =>
      graft.operators.Skew.saltedCountSum(t(s, dir, "lineitem"),
          col("l_returnflag"),
          col("l_quantity").cast(DataTypes.createDecimalType(18, 6)))
        .select(col("k"), col("n"), round(col("s").cast("double"), 2).as("s"))
        .orderBy(col("k")))

  /** Salted fact⋈dim join (hot fact keys spread over dim replicas) must
    * equal the plain equi-join — oracle is exactly that. */
  private val joinSkewSalted = Q(
    "join_skew_salted",
    Some("""
      SELECT l_orderkey, l_linenumber, s_name
      FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
      WHERE l_orderkey < 200
      ORDER BY l_orderkey, l_linenumber"""),
    (s, dir) =>
      graft.operators.Skew.saltedJoin(
          t(s, dir, "lineitem").filter(col("l_orderkey") < 200),
          t(s, dir, "supplier"), "l_suppkey", "s_suppkey")
        .select(col("l_orderkey"), col("l_linenumber"), col("s_name"))
        .orderBy(col("l_orderkey"), col("l_linenumber")))

  /** Bucketed CO-LOCATED join: both sides are written `bucketBy` the
    * join key into catalog tables, so the join consumes the bucketing
    * and needs no Exchange (the 100 TB technique for repeated fact⋈fact
    * joins; ScaleSpec asserts the shuffle-free plan). The oracle is the
    * plain equi-join — value-checks that the bucketed write+read path
    * loses/duplicates nothing. */
  private val joinBucketed = Q(
    "join_bucketed",
    Some("""
      SELECT o_orderstatus, count(*) AS n,
             round(CAST(sum(CAST(l_quantity AS DECIMAL(18,6))) AS DOUBLE), 2) AS qty
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      GROUP BY o_orderstatus
      ORDER BY o_orderstatus"""),
    (s, dir) => {
      Engine.registerDir(s, dir)
      // per-JVM table names: two concurrent catalog runs sharing one
      // working directory (and so one spark-warehouse) must not drop
      // each other's live bucketed tables
      val tag = ProcessHandle.current().pid()
      val (liBkt, oBkt) = (s"graft_li_bkt_$tag", s"graft_o_bkt_$tag")
      Seq(liBkt, oBkt).foreach(Engine.dropTableAndLocation(s, _))
      s.table("lineitem").write
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable(liBkt)
      s.table("orders").write
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable(oBkt)
      s.table(liBkt)
        .join(s.table(oBkt), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"), round(dsum(col("l_quantity")), 2).as("qty"))
        .orderBy(col("o_orderstatus"))
    })

  /** Table-function / generator surface (SURVEY §2.11: the reference
    * has NO table functions — no UNNEST, no LATERAL): posexplode of a
    * per-row array with the ordinal kept, the lateral-join shape every
    * Spark generator plans to (Generate operator). Oracle: DuckDB
    * UNNEST WITH ORDINALITY. ➕ exceeds reference. */
  private val unnestLateral = Q(
    "unnest_lateral",
    Some("""
      SELECT o_orderkey, CAST(i - 1 AS INT) AS pos, l[i] AS x
      FROM (SELECT o_orderkey, [o_orderkey % 3, o_orderkey % 5, o_orderkey % 7] AS l
            FROM orders WHERE o_orderkey < 100) t,
           (SELECT unnest(generate_series(1, 3)) AS i) s
      ORDER BY o_orderkey, pos"""),
    (s, dir) =>
      t(s, dir, "orders").filter(col("o_orderkey") < 100)
        .select(col("o_orderkey"),
          posexplode(array(col("o_orderkey") % 3, col("o_orderkey") % 5,
            col("o_orderkey") % 7)))
        .select(col("o_orderkey"), col("pos"), col("col").as("x"))
        .orderBy(col("o_orderkey"), col("pos")))

  override def defs: Seq[Q] = Seq(
    scanProjection, scanMemory, scanWriteRoundtrip, scanCsvRoundtrip,
    scanJsonRoundtrip, unnestLateral,
    joinInner, joinLeft, joinRight, joinFull, joinSemi, joinAnti, joinCross,
    joinSelf, joinInequality, joinRange, joinAsof, joinBucketed,
    aggSkewSalted, joinSkewSalted,
    aggBasic, aggDistinct, aggStats, aggBool, aggMinmaxBy, aggBitwise,
    aggListagg, aggCorr, aggSkewKurt, aggRegr, aggPercentile, aggAnyValue,
    aggRollup, aggCube, aggGroupingSets, aggGlobal,
    sortMulti, sortNulls, limitOffset, topk, distinctRows,
    setopUnionAll, setopUnion, setopIntersect, setopIntersectAll,
    setopExcept, setopExceptAll,
    subqScalar, subqIn, subqNotIn, subqScalarSelect, subqNested,
    cteChained, complexUnionCte, complexNested, complexCteWindow, complexExpr,
    windowRank, windowRunning, windowFrames, eventsTimeBucket)
}
