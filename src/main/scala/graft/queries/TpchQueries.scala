package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine

/** TPC-H q01–q22 adapted to the driver's subset schema (FIXTURES.md §A).
  *
  * The reference runs the full spec queries (`/root/reference/src/tpch/
  * queries.rs:1-687`); our testdata lacks partsupp and several columns
  * (l_shipmode, l_commitdate, l_receiptdate, o_comment, c_phone,
  * p_container, addresses). Each adapted query keeps the original's
  * *operator shape* (same joins/subquery/aggregation structure) over the
  * available columns; the per-query delta is documented on each entry.
  *
  * All queries are DataFrame-DSL (declarative → Catalyst handles
  * pushdown/pruning/join selection); oracle strings are plain ANSI SQL
  * for DuckDB.
  */
object TpchQueries extends QueryCatalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.t(s, dir, name)

  private def ts(v: String) = to_timestamp_ntz(lit(v))

  /** Q1 — pricing summary report. Unchanged vs spec. */
  val q01 = Q(
    "tpch_q01",
    Some("""
      SELECT l_returnflag, l_linestatus,
             round(sum(l_quantity), 2) AS sum_qty,
             round(sum(l_extendedprice), 2) AS sum_base_price,
             round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
             round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
             round(avg(l_quantity), 4) AS avg_qty,
             round(avg(l_extendedprice), 4) AS avg_price,
             round(avg(l_discount), 4) AS avg_disc,
             count(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""),
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= ts("1998-09-02 00:00:00"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
          round(avg(col("l_quantity")), 4).as("avg_qty"),
          round(avg(col("l_extendedprice")), 4).as("avg_price"),
          round(avg(col("l_discount")), 4).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    })

  override def defs: Seq[Q] = Seq(q01)
}
