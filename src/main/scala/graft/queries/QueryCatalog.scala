package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One named catalog entry: the Spark-side query (DataFrame DSL) plus,
  * when SQL-expressible, an equivalent ANSI-SQL oracle the driver runs
  * in DuckDB over the same parquet tables (SparkEntry contract).
  *
  * Column names/aliases MUST match between `run`'s result and `oracle` —
  * the driver sorts columns by name before hashing. Double-typed
  * aggregates are rounded on BOTH sides so accumulation-order ULP
  * differences between engines can't flip the hash.
  */
final case class Q(
    name: String,
    oracle: Option[String],
    run: (SparkSession, String) => DataFrame)

trait QueryCatalog {
  def defs: Seq[Q]
}
