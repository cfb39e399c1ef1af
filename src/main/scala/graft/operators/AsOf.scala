package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (nearest-event) join — the time-series primitive the reference
  * lacks entirely (its join surface is equi/inequality only,
  * `src/physical/operators/hash_join.rs`); standard in kdb/pandas/
  * DuckDB (`ASOF JOIN`), essential for feature backfill ("state of X
  * when Y happened") in training-data pipelines.
  *
  * Spark-first plan: NOT a range join (which explodes to a
  * cross-product-per-key then filters). Both sides are tagged and
  * UNIONed, shuffled ONCE on the key, and a running `last(_, ignore
  * nulls)` window carries the most recent right-side values onto each
  * left row — O(n log n) per key group, one Exchange total, no join
  * operator at all. At 100 TB this is the difference between a shuffle
  * and a combinatorial explosion on hot keys.
  *
  * Semantics match DuckDB/pandas `merge_asof` backward direction:
  * each left row matches the single right row with the greatest
  * `rightTime <= leftTime` in the same key group (ties inclusive),
  * LEFT-OUTER (unmatched left rows keep null right columns).
  * `forward` flips the inequality; `toleranceSeconds` bounds the gap.
  */
object AsOf {

  def join(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTime: String, rightTime: String,
      rightSuffix: String = "_r",
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(Seq("backward", "forward").contains(direction), s"bad direction $direction")

    val leftCols = left.columns.filterNot(c => keys.contains(c) || c == leftTime).toSeq
    val rightCols = right.columns.filterNot(keys.contains).toSeq
    val rOut = rightCols.map(c => c -> s"$c$rightSuffix").toMap

    // tag + align schemas: left rows carry null right columns and vice
    // versa, so the union is well-typed without any join
    val lTagged = left.select(
      keys.map(col) ++
        Seq(col(leftTime).as("__t"), lit(1).as("__side")) ++
        leftCols.map(col) ++
        rightCols.map(c => lit(null).cast(right.schema(c).dataType).as(rOut(c))): _*)
    val rTagged = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as("__t"), lit(0).as("__side")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)) ++
        rightCols.map(c => col(c).as(rOut(c))): _*)

    // one shuffle: partition by key, order by time (right sorts before
    // left at equal times so ties match inclusively); running last()
    // carries the newest right values onto every subsequent left row
    val ord = if (direction == "backward") Seq(col("__t").asc, col("__side").asc)
              else Seq(col("__t").desc, col("__side").asc)
    val w = Window.partitionBy(keys.map(col): _*).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val carried = rightCols.foldLeft(lTagged.unionByName(rTagged)) { (df, c) =>
      df.withColumn(rOut(c), last(col(rOut(c)), ignoreNulls = true).over(w))
    }

    val matchedTime = col(rOut.getOrElse(rightTime, rightTime))
    val withinTol: Column = toleranceSeconds match {
      case None => lit(true)
      case Some(tol) =>
        // numeric times are already seconds; temporal ones go through an
        // explicit LTZ cast ("timestamp" alone resolves against the
        // session's spark.sql.timestampType, and BIGINT→NTZ is invalid)
        def secs(c: Column): Column = left.schema(leftTime).dataType match {
          case _: org.apache.spark.sql.types.NumericType => c.cast("double")
          case _ => c.cast("timestamp_ltz").cast("double")
        }
        val gapSec = abs(secs(col("__t")) - secs(matchedTime))
        matchedTime.isNull || gapSec <= tol
    }

    val result = carried
      .filter(col("__side") === 1)
      .withColumn("__keep", withinTol)
    // outside tolerance → null out the right columns (still left-outer)
    val nulled = rightCols.foldLeft(result) { (df, c) =>
      df.withColumn(rOut(c), when(col("__keep"), col(rOut(c))))
    }
    nulled.select(
      keys.map(col) ++ Seq(col("__t").as(leftTime)) ++
        leftCols.map(col) ++
        rightCols.map(c => col(rOut(c))): _*)
  }
}
