package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.ExplainMode

/** The PRE-optimization ("stock") shapes of the five TPC-H queries the
  * r16/r17 spill campaign reshaped. Single source of truth shared by
  * the ScaleSweep A/B runners (which re-measure stock vs shipped at
  * sf100) and [[PlanDump]] (which emits the before/after
  * `explain("formatted")` evidence under plans/r17/). Each stock string
  * is byte-identical to the query's declared ORACLE SQL modulo
  * formatting — the reshapes changed the plan, never the result, and
  * the driver's DuckDB differ re-proves that every round.
  */
private[graft] object TpchStockShapes {

  /** q4 stock: EXISTS decorrelates to a left-semi sort-merge join that
    * sorts the 600M-row lineitem side (17.4 GB mem + 6.6 GB disk spill
    * at sf100). Shipped shape: per-order max(l_shipdate) aggregate. */
  val q04 = """
      SELECT o_orderpriority, count(*) AS order_count
      FROM orders
      WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
        AND EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      GROUP BY o_orderpriority
      ORDER BY o_orderpriority"""

  /** q11 stock: 600M rows into 20M l_partkey groups — map-side partial
    * agg builds input-keyspace hash tables (45.3 GB mem + 7 GB disk
    * spill at sf100). Shipped shape: REPARTITION(l_partkey) on the
    * join output before the aggregate. */
  val q11 = """
      WITH pp AS (SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,6))) AS dval
                  FROM lineitem, supplier WHERE l_suppkey = s_suppkey
                  GROUP BY l_partkey)
      SELECT l_partkey, round(CAST(dval AS DOUBLE), 2) AS value
      FROM pp
      WHERE CAST(dval AS DOUBLE) > (SELECT 1.5 * CAST(sum(dval) AS DOUBLE) / count(*) FROM pp)
      ORDER BY value DESC, l_partkey"""

  /** q16 stock: count(DISTINCT l_suppkey) plans a dedupe aggregate over
    * the part⋈lineitem join output (input-keyspace partial-agg state)
    * on top of a sort-merge join that sorts lineitem (together 17.2 GB
    * mem + 3.2 GB disk at sf100). Shipped: SHUFFLE_HASH(part) +
    * REPARTITION on the dedupe key. */
  val q16 = """
      SELECT p_brand, p_type, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
      FROM lineitem, part
      WHERE p_partkey = l_partkey
        AND p_brand <> 'Brand#1' AND p_type <> 'PROMO'
        AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
        AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      GROUP BY p_brand, p_type, p_size
      ORDER BY supplier_cnt DESC, p_brand, p_type, p_size"""

  private val q18Body = """
      SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
             round(sum(l_quantity), 2) AS sum_qty
      FROM customer, orders, lineitem
      WHERE o_orderkey IN (%s)
        AND c_custkey = o_custkey AND o_orderkey = l_orderkey
      GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
      ORDER BY o_totalprice DESC, o_orderdate, o_orderkey
      LIMIT 100"""

  /** q18 stock: the HAVING subquery groups 600M lineitem rows into
    * ~150M l_orderkey groups (50.6 GB mem + 7.1 GB disk spill at
    * sf100). Shipped: REPARTITION(l_orderkey) on the scan first. */
  val q18 = q18Body.format(
    """SELECT l_orderkey FROM lineitem
         GROUP BY l_orderkey HAVING sum(l_quantity) > 120""")

  /** q18 shipped-shape subquery, for the A/B runner. */
  val q18Prerepart = q18Body.format(
    """SELECT l_orderkey
         FROM (SELECT /*+ REPARTITION(l_orderkey) */ l_orderkey, l_quantity
               FROM lineitem)
         GROUP BY l_orderkey HAVING sum(l_quantity) > 120""")

  /** q21 stock: EXISTS / NOT EXISTS decorrelate to a left-semi plus a
    * left-anti join, each shuffling AND sorting lineitem again — the
    * suite's worst spiller (102 GB mem + 14 GB disk at sf100).
    * Shipped: single-pass per-order distinct-supplier aggregate. */
  val q21 = """
      SELECT s_name, count(*) AS numwait
      FROM supplier, lineitem l1, orders, nation
      WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
        AND o_orderstatus = 'F'
        AND l1.l_shipdate > o_orderdate + INTERVAL 30 DAY
        AND EXISTS (SELECT 1 FROM lineitem l2
                    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        AND NOT EXISTS (SELECT 1 FROM lineitem l3
                        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
                          AND l3.l_shipdate > o_orderdate + INTERVAL 30 DAY)
        AND s_nationkey = n_nationkey
      GROUP BY s_name
      ORDER BY numwait DESC, s_name
      LIMIT 100"""

  /** name -> stock SQL for every query the spill campaign touched. */
  val all: Seq[(String, String)] = Seq(
    "tpch_q04" -> q04, "tpch_q11" -> q11, "tpch_q16" -> q16,
    "tpch_q18" -> q18, "tpch_q21" -> q21)
}

/** Emits the `explain("formatted")` before/after evidence for every
  * query the r17 spill-elimination campaign reshaped:
  * `<outDir>/<query>_before.txt` (the stock shape, from
  * [[TpchStockShapes]]) and `<outDir>/<query>_after.txt` (the shipped
  * declared query, straight out of `SparkEntry.queries`). Plans are
  * captured at plan time (AQE `isFinalPlan=false`) on the sf dir given —
  * shape claims (join strategy, Exchange count, PushedFilters) are
  * scale-independent; the sf100 *runtime* numbers live in
  * docs/BENCH_NOTES.md.
  *
  *   sbt -batch "runMain graft.PlanDump /root/testdata/sf0.1 plans/r17"
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val outDir = args.lift(1).getOrElse("plans/r17")
    val spark = Engine.session()
    Engine.registerDir(spark, sfDir)
    Files.createDirectories(Paths.get(outDir))
    val mode = ExplainMode.fromString("formatted")

    def write(name: String, suffix: String, planText: String): Unit = {
      val p = Paths.get(outDir, s"${name}_$suffix.txt")
      val header =
        s"""-- $name ($suffix) — captured by graft.PlanDump on $sfDir
           |-- Engine.session defaults: AQE on, autoBroadcastJoinThreshold=64MB,
           |-- runtime bloom-filter join on; plan-time capture (isFinalPlan=false).
           |-- Join strategies follow the SIZE ESTIMATES of this sf dir: fact-side
           |-- sort-merge/shuffled-hash shapes appear at sf>=10; at sf0.1 the same
           |-- subtrees broadcast. sf100 runtime metrics: docs/BENCH_NOTES.md r17.
           |""".stripMargin
      Files.writeString(p, header + planText)
      println(s"[plandump] wrote $p")
    }

    TpchStockShapes.all.foreach { case (name, stockSql) =>
      write(name, "before",
        spark.sql(stockSql).queryExecution.explainString(mode))
      write(name, "after",
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(mode))
    }
    // The untouched TPC-H queries, captured as `_current` — the
    // evidence behind OPTIMIZATION_r17.md's "examined, left alone"
    // rows (join strategies, PushedFilters, Exchange counts).
    val touched = TpchStockShapes.all.map(_._1).toSet
    (1 to 22).map(i => f"tpch_q$i%02d").filterNot(touched).foreach { name =>
      write(name, "current",
        SparkEntry.queries(name)(spark, sfDir)
          .queryExecution.explainString(mode))
    }
    spark.stop()
  }
}
