package graft

import org.apache.spark.sql.SparkSession

/** Trino-compatible function surface (reference `ScalarFunction` enum,
  * `src/planner/logical_expr.rs:270-536`; SQL-name dispatch
  * `src/planner/binder.rs:1504-2710`). Registration is idempotent.
  */
object TrinoFunctions {
  def register(spark: SparkSession): Unit = {
    // filled in by the function layer (SURVEY §7.2 step 3)
  }
}
