package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-handling utilities for hot-key workloads (SURVEY §4.2 /
  * builder mandate: "skewed keys → salting or AQE skew-join").
  *
  * AQE's skew-join split handles most join skew automatically
  * (enabled in Engine.session). These helpers cover the cases AQE
  * doesn't: aggregation skew and deliberate two-stage combining.
  */
object Skew {

  /** Two-stage salted aggregation: count/sum-style aggregates over a
    * heavily skewed key. Stage 1 aggregates on (key, salt) — spreading
    * one hot key over `salts` reducers; stage 2 merges the partials.
    * Produces exactly groupBy(key).agg(count, sum) but with bounded
    * per-reducer load.
    */
  def saltedCountSum(df: DataFrame, key: Column, value: Column,
      salts: Int = 16): DataFrame = {
    val salted = df.select(key.as("k"), value.as("v"))
      .withColumn("salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(col("k"), col("salt"))
      .agg(count(lit(1)).as("pn"), sum(col("v")).as("ps"))
      .groupBy(col("k"))
      .agg(sum(col("pn")).as("n"), sum(col("ps")).as("s"))
  }

  /** Salted join of a skewed fact against a small dimension: the fact's
    * hot keys spread across `salts` replicas of the dimension rows.
    * Semantically identical to fact.join(dim, factKey === dimKey).
    * (With a broadcastable dim prefer broadcast(); this is for dims too
    * large to broadcast but small enough to replicate `salts`×.)
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(xxhash64(col(factKey), monotonically_increasing_id()), lit(salts)))
    val replicatedDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1)).cast("array<bigint>")))
    saltedFact
      .join(replicatedDim, saltedFact(factKey) === replicatedDim(dimKey) &&
        saltedFact("__salt") === replicatedDim("__salt"))
      .drop("__salt")
  }
}
