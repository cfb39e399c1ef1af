package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.EventStream

/** Pins Spark's append-mode watermark eviction semantics at the exact
  * boundary, so the StreamingQueries batch oracles can mirror them
  * precisely (round-5 advisory: the oracle's horizon cut must match
  * WatermarkSupport, including the millisecond truncation of the
  * watermark — max event time is tracked in ms, not µs).
  */
class WatermarkBoundarySpec extends AnyFunSuite {
  import TestSpark._

  private def runWindowed(rows: Seq[String]): Set[String] = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("wm_boundary").toString
    rows.toDF("raw")
      .select(col("raw").cast(TimestampType).as("ts"),
        lit("e").as("event_type"), lit(1.0).as("value"))
      .write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    EventStream.runToMemory(EventStream.windowedCounts(stream),
        "wm_boundary_sink")
      .select(col("window_start").cast("string")).collect()
      .map(_.getString(0)).toSet
  }

  test("window ending exactly ON the watermark: pinned emission semantics") {
    // max ts 03:00:00 → watermark 01:00:00; window [00:00,01:00) ends
    // exactly on it
    val out = runWindowed(Seq("2024-01-01 00:00:00", "2024-01-01 03:00:00"))
    // Spark (WatermarkSupport.watermarkExpression) evicts on
    // end - 1 < watermark, i.e. end <= watermark: the boundary window
    // IS emitted. The batch oracles must use an INCLUSIVE cut.
    assert(out.contains("2024-01-01 00:00:00"), s"boundary window not emitted: $out")
  }

  test("watermark is ms-truncated: µs above the boundary do not advance it") {
    // max ts 03:00:00.000999 → ms-truncated to 03:00:00.000 → watermark
    // still 01:00:00.000; the boundary window must still be emitted,
    // and a max ts 999µs BELOW the next ms must not behave differently
    // from the exact boundary
    val out = runWindowed(Seq("2024-01-01 00:00:00", "2024-01-01 03:00:00.000999"))
    assert(out.contains("2024-01-01 00:00:00"), s"got $out")
    // max ts 02:59:59.999999 → ms-truncated 02:59:59.999 → watermark
    // 00:59:59.999 < window end 01:00:00 → NOT emitted (the µs tail
    // would round it up only if the watermark were µs-precision)
    val below = runWindowed(Seq("2024-01-01 00:00:00", "2024-01-01 02:59:59.999999"))
    assert(!below.exists(_.startsWith("2024-01-01 00:00:00")), s"got $below")
  }

  private def runSessions(rows: Seq[(Long, String)]): Set[String] = {
    val s = spark
    import s.implicits._
    val dir = Files.createTempDirectory("wm_boundary_sess").toString
    rows.toDF("user_id", "raw")
      .select(col("user_id"), col("raw").cast(TimestampType).as("ts"),
        lit(1.0).as("value"))
      .write.parquet(s"$dir/in")
    val stream = spark.readStream
      .schema(spark.read.parquet(s"$dir/in").schema).parquet(s"$dir/in")
    EventStream.runToMemory(EventStream.sessionWindowCounts(stream),
        "wm_boundary_sess_sink")
      .select(col("session_end").cast("string")).collect()
      .map(_.getString(0)).toSet
  }

  test("session ending exactly ON the watermark: same inclusive + ms-truncated rules") {
    // user 1's session: one event at 00:00:00 → end 00:30:00 (µs
    // precision); user 2's event at 02:30:00 sets watermark 00:30:00
    // → boundary session IS emitted (inclusive, like windows)
    val onB = runSessions(Seq((1L, "2024-01-01 00:00:00"), (2L, "2024-01-01 02:30:00")))
    assert(onB.contains("2024-01-01 00:30:00"), s"got $onB")
    // session end carries µs (00:30:00.000700); max ts 02:30:00.000800
    // µs-precision would give watermark 00:30:00.000800 ≥ end, but the
    // ms-truncated watermark is 00:30:00.000 < end → NOT emitted
    val above = runSessions(
      Seq((1L, "2024-01-01 00:00:00.000700"), (2L, "2024-01-01 02:30:00.000800")))
    assert(!above.exists(_.startsWith("2024-01-01 00:30:00")), s"got $above")
  }
}
