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

  test("mixture: epoch weights produce exact copy counts, deterministically, no shuffle") {
    val out = Curation.mixture(docs, col("source"), col("text"),
      Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0), defaultEpochs = 1.0)
    out.collect()
    // pure explode+filter: no shuffle anywhere in the plan
    assert(!out.queryExecution.executedPlan.toString.contains("Exchange"))

    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val srcN = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // src2 dropped entirely
    assert(!bySrc.contains("src2"))
    // src0 at 2.5 epochs: between 2n and 3n copies (2 full + ~50% tail)
    assert(bySrc("src0") >= 2 * srcN("src0") && bySrc("src0") <= 3 * srcN("src0"))
    // src1 at 0.4: a strict subset
    assert(bySrc("src1") > 0 && bySrc("src1") < srcN("src1"))
    // default 1.0: exactly one copy of every row
    val defaultSrc = srcN.keySet -- Set("src0", "src1", "src2")
    assert(defaultSrc.forall(s => bySrc(s) == srcN(s)))

    // deterministic: identical selection on a re-run
    val again = Curation.mixture(docs, col("source"), col("text"),
      Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0), defaultEpochs = 1.0)
    val k = (d: org.apache.spark.sql.DataFrame) =>
      d.select("doc_id", "copy_idx").collect().map(r => (r.getLong(0), r.getInt(1))).sorted
    assert(k(out).sameElements(k(again)))
  }

  test("assignSplit: stable under corpus growth, covers all rows, roughly 80/10/10") {
    val full = Curation.assignSplit(docs, col("text"), 80, 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // split assignment of a subset is identical to its assignment in the
    // full corpus — the property that keeps eval sets honest as data grows
    val subset = Curation.assignSplit(docs.filter(col("doc_id") < 20), col("text"), 80, 10)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(subset.forall { case (id, s) => full(id) == s })
    val byKind = full.values.groupBy(identity).map { case (k, v) => k -> v.size }
    assert(byKind.keySet == Set("train", "validation", "test"))
    assert(byKind("train") > byKind("validation") && byKind("train") > byKind("test"))
    assert(byKind.values.sum == full.size)
  }

  test("shuffleOrder: valid per-shard permutation, seed changes the order, re-run identical") {
    val a = Curation.shuffleOrder(docs, col("text"), "s1:", 4)
      .select("doc_id", "shard", "ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // contiguous ranks 1..n within each shard
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.sameElements(1 to rows.length))
    }
    val b = Curation.shuffleOrder(docs, col("text"), "s1:", 4)
      .select("doc_id", "shard", "ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(a.sorted.sameElements(b.sorted))
    val c = Curation.shuffleOrder(docs, col("text"), "s2:", 4)
      .select("doc_id", "shard", "ord").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(!a.sorted.sameElements(c.sorted), "different seed must reshuffle")
  }

  test("shardManifest: shards partition the corpus, checksum is order-independent") {
    val m = Curation.shardManifest(docs, col("doc_id"), col("text"), col("n_chars"), 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m.keySet.subsetOf((0L until 8L).toSet))
    assert(m.values.map(_._1).sum == docs.count())
    // identical manifest from a different physical layout (XOR commutes)
    val m2 = Curation.shardManifest(docs.repartition(13), col("doc_id"), col("text"),
        col("n_chars"), 8)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(3)))).toMap
    assert(m == m2)
  }

  test("curation ops are physical-layout independent (repartitioning changes nothing)") {
    // the cluster-scale determinism claim: results depend only on
    // content, never on how rows happen to be partitioned
    val variants = Seq(docs, docs.repartition(3), docs.repartition(7, col("source")))
    def norm(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val splits = variants.map(d =>
      norm(Curation.assignSplit(d, col("text"), 80, 10).select("doc_id", "split")))
    assert(splits.distinct.size == 1)
    val orders = variants.map(d =>
      norm(Curation.shuffleOrder(d, col("text"), "s1:", 4).select("doc_id", "shard", "ord")))
    assert(orders.distinct.size == 1)
    val mixes = variants.map(d =>
      norm(Curation.mixture(d, col("source"), col("text"),
        Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0)).select("doc_id", "copy_idx")))
    assert(mixes.distinct.size == 1)
  }

  test("vocabTopK plans as partial agg + TakeOrderedAndProject") {
    val df = Curation.vocabTopK(docs, col("text"), 2, 10)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("TakeOrderedAndProject"))
    assert(p.contains("partial_"))
  }
}
