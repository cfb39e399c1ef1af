package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOf

/** As-of join semantics on handcrafted data (backward/forward,
  * tolerance, ties, unmatched-left) + the plan-shape guarantee: one
  * Exchange, no join operator. */
class AsOfSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val (quotes, trades) = {
    val s = spark
    import s.implicits._
    // key "A": quotes at t=1,5,10; trades at t=0,5,7,20
    // key "B": no quotes at all
    val q = Seq(("A", 1L, 100.0), ("A", 5L, 105.0), ("A", 10L, 110.0))
      .toDF("sym", "qt", "px")
    val t = Seq(("A", 0L), ("A", 5L), ("A", 7L), ("A", 20L), ("B", 3L))
      .toDF("sym", "tt")
    (q, t)
  }

  private def collectMap(df: org.apache.spark.sql.DataFrame): Map[(String, Long), Option[Double]] =
    df.collect().map { r =>
      (r.getAs[String]("sym"), r.getAs[Long]("tt")) ->
        Option(r.getAs[Any]("px_r")).map(_.asInstanceOf[Double])
    }.toMap

  test("backward: greatest right time <= left time, inclusive ties, left-outer") {
    val out = collectMap(AsOf.join(trades, quotes, Seq("sym"), "tt", "qt"))
    assert(out(("A", 0L)).isEmpty)        // nothing before t=0
    assert(out(("A", 5L)).contains(105.0)) // tie matches inclusively
    assert(out(("A", 7L)).contains(105.0)) // most recent prior
    assert(out(("A", 20L)).contains(110.0))
    assert(out(("B", 3L)).isEmpty)        // key with no right rows
  }

  test("forward: smallest right time >= left time") {
    val out = collectMap(AsOf.join(trades, quotes, Seq("sym"), "tt", "qt",
      direction = "forward"))
    assert(out(("A", 0L)).contains(100.0))
    assert(out(("A", 5L)).contains(105.0)) // tie still inclusive
    assert(out(("A", 7L)).contains(110.0))
    assert(out(("A", 20L)).isEmpty)        // nothing after t=20
  }

  test("tolerance bounds the match gap (numeric times count in seconds)") {
    // t=20 matches qt=10 backward, but gap 10 > tol 5 → nulled out
    val out = collectMap(AsOf.join(trades, quotes, Seq("sym"), "tt", "qt",
      toleranceSeconds = Some(5L)))
    assert(out(("A", 7L)).contains(105.0)) // gap 2 <= 5 survives
    assert(out(("A", 20L)).isEmpty)
  }

  test("plan: exactly one Exchange, no join operator") {
    val df = AsOf.join(trades, quotes, Seq("sym"), "tt", "qt")
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"as-of must not plan a join:\n$p")
    assert("Exchange".r.findAllIn(p).size <= 2, // shuffle + AQE read
      s"expected a single shuffle:\n$p")
  }

  test("matches DuckDB ASOF semantics on real events (spot check)") {
    val ev = Engine.t(spark, sf0001, "events")
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id"))
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts"), col("event_id"))
    val out = AsOf.join(clicks, views, Seq("user_id"), "ts", "ts")
    assert(out.count() == clicks.count()) // left-outer: one row per click
    // every matched view is the same user, not after the click
    val bad = out.filter(col("ts_r").isNotNull &&
      (col("ts_r") > col("ts"))).count()
    assert(bad == 0)
  }
}
