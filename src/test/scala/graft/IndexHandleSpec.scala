package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The fit-once-serve-many seam (VERDICT r14 #1): index HANDLES
  * ([[graft.operators.CentroidIndexHandle]] /
  * [[graft.operators.TwoLevelIndexHandle]]) let a long session fit one
  * index, broadcast it ONCE, serve any number of assign/dedup/top-k
  * batches from it, and destroy the broadcast explicitly — where the
  * self-contained entry points necessarily build (and leak to the
  * ContextCleaner) one broadcast per call. These specs count actual
  * broadcast builds and pin handle-served results equal to the
  * self-contained ones. */
class IndexHandleSpec extends AnyFunSuite {
  import TestSpark._

  private def emb = Engine.t(spark, sf0001, "embeddings")

  test("flat handle: N assign/dedup/topk batches build ZERO broadcasts beyond the fit's") {
    val h = Similarity.fitIndex(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    val afterFit = Similarity.indexBroadcastBuilds.get
    val batches = (0 until 3).map { i =>
      Similarity.kmeansAssign(emb.filter(col("vec_id") % 3 === i),
        "vec_id", "embedding", h).count()
    }
    assert(batches.sum == emb.count())
    val dd = Similarity.semanticDedup(emb, "vec_id", "embedding", 0.35, h)
      .orderBy(col("vec_id")).collect()
    val queries = emb.filter(col("vec_id") < 3)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_vec"))
    val topk = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      "q_id", "q_vec", 3, 8, h).count()
    assert(topk == 9) // 3 queries × top-3 (nProbe=8 covers all cells)
    assert(Similarity.indexBroadcastBuilds.get == afterFit,
      "handle-served batches must reuse the fit's single broadcast")

    // handle-served results == the self-contained path's
    val selfDd = Similarity.semanticDedup(emb, "vec_id", "embedding",
        nCells = 8, iters = 2, threshold = 0.35)
      .orderBy(col("vec_id")).collect()
    assert(dd.toSeq == selfDd.toSeq)
    val hAssign = Similarity.kmeansAssign(emb, "vec_id", "embedding", h)
      .orderBy(col("vec_id")).collect()
    val selfAssign = Similarity.kmeansAssign(emb, "vec_id", "embedding",
        nCells = 8, iters = 2)
      .orderBy(col("vec_id")).collect()
    assert(hAssign.toSeq == selfAssign.toSeq)

    // explicit lifecycle: after destroy, a new query on the handle fails
    h.destroy()
    intercept[Exception](
      Similarity.kmeansAssign(emb, "vec_id", "embedding", h).collect())
  }

  test("flat handle exposes the fitted index driver-side (ids, vectors, dims)") {
    val h = Similarity.fitIndex(emb, "vec_id", "embedding", nCells = 8, iters = 1)
    try {
      assert(h.nCells == 8 && h.dim == 64)
      assert(h.cellIds.size == 8 && h.cellVecs.forall(_.size == 64))
      // handle round-trip: rewrapping the exposed centroids serves the
      // same assignment (the materialize-reload path of a prod session)
      val h2 = Similarity.indexOf(spark, (h.cellIds, h.cellVecs))
      try {
        val a = Similarity.kmeansAssign(emb, "vec_id", "embedding", h)
          .select(col("vec_id"), col("cell_id")).orderBy(col("vec_id")).collect()
        val b = Similarity.kmeansAssign(emb, "vec_id", "embedding", h2)
          .select(col("vec_id"), col("cell_id")).orderBy(col("vec_id")).collect()
        assert(a.toSeq == b.toSeq)
      } finally h2.destroy()
    } finally h.destroy()
  }

  test("two-level handle: N batches build zero extra broadcasts; results == tuple-index path") {
    val h = Similarity.fitTwoLevelIndex(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 3, iters = 2)
    try {
      val afterFit = Similarity.indexBroadcastBuilds.get
      (0 until 3).foreach { i =>
        Similarity.twoLevelAssign(emb.filter(col("vec_id") % 3 === i),
          "vec_id", "embedding", h).count()
      }
      val dd = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
          0.35, h, false)
        .orderBy(col("vec_id")).collect()
      assert(Similarity.indexBroadcastBuilds.get == afterFit)
      val selfDd = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
          nSuper = 3, nSubPerCell = 3, iters = 2, threshold = 0.35)
        .orderBy(col("vec_id")).collect()
      assert(dd.toSeq == selfDd.toSeq)
    } finally h.destroy()
  }

  test("LSH union only ADDS witnesses: every base dup survives, dup_of can only shrink") {
    val base = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
        nSuper = 3, nSubPerCell = 3, iters = 2, threshold = 0.35)
      .orderBy(col("vec_id")).collect()
    val union = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
        nSuper = 3, nSubPerCell = 3, iters = 2, threshold = 0.35,
        lshUnion = true)
      .orderBy(col("vec_id")).collect()
    assert(base.length == union.length)
    base.zip(union).foreach { case (b, u) =>
      assert(b.getLong(0) == u.getLong(0))
      assert(b.getLong(1) == u.getLong(1), "cell assignment must not change")
      if (!b.isNullAt(2)) {
        assert(!u.isNullAt(2), s"vec ${b.getLong(0)}: union lost a base witness")
        assert(u.getLong(2) <= b.getLong(2),
          s"vec ${b.getLong(0)}: union witness must be <= the cell witness")
      }
    }
    // and on this data the union genuinely recovers cross-cell dups
    val recovered = base.zip(union).count { case (b, u) =>
      b.isNullAt(2) && !u.isNullAt(2)
    }
    assert(recovered > 0, "expected boundary-straddling dups at sf0.001")
    // every recovered witness is a TRUE near-dup (cosine >= threshold):
    // spot-verify through the exact pair set
    val pairs = Similarity.cosinePairs(emb, "vec_id", "embedding",
        threshold = 0.35, lsh = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    base.zip(union).foreach { case (b, u) =>
      if (b.isNullAt(2) && !u.isNullAt(2))
        assert(pairs.contains((u.getLong(2), u.getLong(0))),
          s"recovered witness ${u.getLong(2)} for ${u.getLong(0)} is not a real near-dup")
    }
  }
}
