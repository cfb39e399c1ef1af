package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Curation

/** Curation primitives: determinism + the plan shapes that make them
  * 100 TB-safe (map-side sampling, sharded packing, two-phase vocab). */
class CurationSpec extends AnyFunSuite {
  import TestSpark._

  private def docs = Engine.t(spark, sf0001, "documents")

  test("hash sampling is deterministic and map-side (no shuffle)") {
    val a = Curation.hashSample(docs, col("text"), 20).select("doc_id").collect().map(_.getLong(0)).sorted
    val b = Curation.hashSample(docs, col("text"), 20).select("doc_id").collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val df = Curation.hashSample(docs, col("text"), 20)
    df.collect()
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
    // ~20% of rows, loosely (content hash is uniform)
    val frac = a.length.toDouble / docs.count()
    assert(frac > 0.08 && frac < 0.35, s"fraction $frac")
  }

  test("stratified sampling returns at most n per stratum, deterministically") {
    val out = Curation.stratifiedSample(
      docs.withColumn("stratum", pmod(col("doc_id"), lit(5))), col("stratum"), col("text"), 3)
    val sizes = out.groupBy(col("stratum")).count().collect().map(_.getLong(1))
    assert(sizes.forall(_ <= 3) && sizes.nonEmpty)
  }

  test("packBlocks: block ranges tile the per-shard token stream") {
    val d = docs
      .withColumn("shard", pmod(col("doc_id"), lit(4)))
      .withColumn("n_tokens", graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
    val out = Curation.packBlocks(d, col("shard"), col("doc_id"), col("n_tokens"), 512)
      .select("shard", "doc_id", "n_tokens", "start_block", "end_block").collect()
    // per shard: blocks are non-decreasing with doc order, and a doc
    // spanning k tokens covers ceil over 512-sized blocks consistently
    out.groupBy(_.getLong(0)).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getLong(1))
      var cum = 0L
      sorted.foreach { r =>
        val (nt, sb, eb) = (r.getLong(2), r.getLong(3), r.getLong(4))
        assert(sb == cum / 512, s"start_block mismatch at doc ${r.getLong(1)}")
        assert(eb == (cum + nt - 1) / 512)
        cum += nt
      }
    }
  }

  test("vocabTopK plans as partial agg + TakeOrderedAndProject") {
    val df = Curation.vocabTopK(docs, col("text"), 2, 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_"))
  }
}
