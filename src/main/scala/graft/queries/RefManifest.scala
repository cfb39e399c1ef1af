package graft.queries

import java.io.File

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.expr

/** Shared access to the reference's golden-query manifest
  * (`tests/expected_results/manifest.json`, 156 queries — the
  * reference's own DuckDB-validated correctness suite) and the
  * deterministic schema padding that lets the full suite run on the
  * driver testdata (a TPC-H schema-subset; FIXTURES.md).
  *
  * Used by RefParitySpec (execute-parity over all 156),
  * RefGoldenQueries (value-checked func/+expr/ rows) and Bench (the
  * golden-suite timing line). The manifest is read from the reference
  * checkout at runtime — nothing is vendored into this repo.
  */
object RefManifest {

  val path = "/root/reference/tests/expected_results/manifest.json"

  def available: Boolean = new File(path).exists()

  /** All (id, sql) entries, manifest order. Empty when no checkout. */
  def loadAll(): Seq[(String, String)] = {
    if (!available) return Seq.empty
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val root = mapper.readTree(new File(path))
    (0 until root.size()).map { i =>
      val q = root.get(i)
      q.get("id").asText() -> q.get("sql").asText()
    }
  }

  /** Derived columns padding each testdata table up to the full TPC-H
    * schema: pure functions of the key columns, so the padded values
    * are identical across runs and partitionings. (The q16 supplier
    * sliver deterministically matches LIKE '%Customer%Complaints%'.) */
  val padColumns: Map[String, Seq[(String, String)]] = Map(
    "lineitem" -> Seq(
      "l_commitdate" -> "cast(l_shipdate as timestamp_ntz) - make_interval(0,0,0,cast(l_orderkey % 30 as int))",
      "l_receiptdate" -> "cast(l_shipdate as timestamp_ntz) + make_interval(0,0,0,cast(l_linenumber % 30 as int))",
      "l_shipmode" -> "element_at(array('MAIL','SHIP','AIR','RAIL','TRUCK','FOB','REG AIR'), cast((l_orderkey + l_linenumber) % 7 + 1 as int))",
      "l_comment" -> "concat('lineitem comment ', l_orderkey, '-', l_linenumber)"),
    "orders" -> Seq(
      "o_shippriority" -> "0",
      "o_clerk" -> "concat('Clerk#', lpad(cast(o_orderkey % 1000 as string), 9, '0'))",
      // some NULLs so IS [NOT] NULL sweeps exercise both branches
      "o_comment" -> "if(o_orderkey % 10 = 0, cast(null as string), concat('order comment ', o_orderkey))"),
    "customer" -> Seq(
      "c_address" -> "concat('Address ', c_custkey)",
      "c_phone" -> "concat(cast(10 + c_custkey % 25 as string), '-', lpad(cast(c_custkey % 10000000 as string), 7, '0'))",
      "c_comment" -> "concat('customer comment ', c_custkey)"),
    "supplier" -> Seq(
      "s_address" -> "concat('Supplier Address ', s_suppkey)",
      "s_phone" -> "concat(cast(10 + s_suppkey % 25 as string), '-', lpad(cast(s_suppkey % 10000000 as string), 7, '0'))",
      "s_comment" -> "if(s_suppkey % 13 = 0, 'sad Customer bad Complaints', concat('supplier comment ', s_suppkey))"),
    "part" -> Seq(
      "p_mfgr" -> "concat('Manufacturer#', cast(p_partkey % 5 + 1 as string))",
      "p_container" -> "element_at(array('SM CASE','SM BOX','SM PACK','MED BAG','MED BOX','LG CASE','LG BOX','JUMBO PKG'), cast(p_partkey % 8 + 1 as int))"),
    "nation" -> Seq(
      "n_comment" -> "concat('nation comment ', n_nationkey)"))

  /** Replace the registered temp views with padded versions (columns
    * the testdata already has are skipped) and synthesize `partsupp`
    * from the distinct (l_partkey, l_suppkey) pairs. Call
    * `restoreViews` after — the session's other users expect the raw
    * schema. */
  def padViews(spark: SparkSession): Unit = {
    padColumns.foreach { case (table, derived) =>
      val base = spark.table(table)
      val have = base.columns.toSet
      val out = derived.filterNot(c => have(c._1)).foldLeft(base) {
        case (df, (name, e)) => df.withColumn(name, expr(e))
      }
      out.createOrReplaceTempView(table)
    }
    spark.sql("""
      SELECT DISTINCT
        l_partkey AS ps_partkey,
        l_suppkey AS ps_suppkey,
        cast((l_partkey * 7 + l_suppkey) % 9999 + 1 as int) AS ps_availqty,
        cast(l_partkey % 1000 + 1 as double) AS ps_supplycost,
        concat('ps comment ', l_partkey, '-', l_suppkey) AS ps_comment
      FROM lineitem""").createOrReplaceTempView("partsupp")
  }

  /** Restore the raw parquet-backed views for `sfDir` and drop the
    * synthesized partsupp. */
  def restoreViews(spark: SparkSession, sfDir: String): Unit = {
    padColumns.keys.foreach { t =>
      graft.sources.ParquetTables.read(spark, s"$sfDir/$t.parquet")
        .createOrReplaceTempView(t)
    }
    spark.catalog.dropTempView("partsupp")
  }
}
