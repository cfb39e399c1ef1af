package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity

/** The relation-indexed two-level path (VERDICT r16 #1 — break the
  * MaxFitCells driver-collect ceiling): [[Similarity.kmeansTwoLevelRel]]
  * keeps the sub-centroid set distributed from seed to return and
  * [[Similarity.twoLevelAssignRel]] assigns by a shuffle join against
  * it, so `cells ∝ corpus` no longer passes through the driver. These
  * specs pin (a) fit bit-parity with the collect-based fit, (b)
  * assignment/dedup bit-parity with the broadcast kernel on the same
  * index, (c) that the ceiling is actually gone (a cells-count the
  * collect fit refuses runs fine), and (d) that the plan is the one we
  * want — a join, no whole-index broadcast, no corpus-sized collect. */
class RelIndexSpec extends AnyFunSuite {
  import TestSpark._

  private def emb = Engine.t(spark, sf0001, "embeddings")

  /** Tuple index → the graft_kmeans_fit2 relation contract rows. */
  private def indexRows(idx: (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]))
      : Seq[(Int, Int, Seq[Double])] = {
    val (supers, subs) = idx
    supers.zipWithIndex.map { case (v, s) => (s, -1, v) } ++
      subs.zipWithIndex.flatMap { case (cells, s) =>
        cells.zipWithIndex.map { case (v, b) => (s, b, v) } }
  }

  test("kmeansTwoLevelRel == kmeansTwoLevel: the distributed fit is bit-identical") {
    val tuple = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 3, iters = 2)
    val rel = Similarity.kmeansTwoLevelRel(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 3, iters = 2)
    val got = rel.collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toSeq))
      .sortBy(t => (t._1, t._2)).toSeq
    val want = indexRows(tuple).sortBy(t => (t._1, t._2))
    assert(got == want)
  }

  test("twoLevelAssignRel == twoLevelAssign on the same index (bit-parity at the ceiling's shape)") {
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 4, nSubPerCell = 3, iters = 2)
    val relDf = spark.createDataFrame(indexRows(idx))
      .toDF("super_id", "sub_id", "centroid")
    val viaBc = Similarity.twoLevelAssign(emb, "vec_id", "embedding", idx)
      .select("vec_id", "cell_id").orderBy("vec_id").collect()
    val viaRel = Similarity.twoLevelAssignRel(emb, "vec_id", "embedding", relDf)
      .select("vec_id", "cell_id").orderBy("vec_id").collect()
    assert(viaRel.toSeq == viaBc.toSeq)
    assert(viaRel.nonEmpty)
  }

  test("semanticDedupTwoLevelRel == semanticDedupTwoLevel, with and without the LSH union") {
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 3, iters = 2)
    val relDf = spark.createDataFrame(indexRows(idx))
      .toDF("super_id", "sub_id", "centroid")
    for (union <- Seq(false, true)) {
      val viaBc = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
          0.35, Similarity.twoLevelIndexOf(spark, idx), lshUnion = union)
        .orderBy("vec_id").collect()
      val viaRel = Similarity.semanticDedupTwoLevelRel(emb, "vec_id",
          "embedding", 0.35, relDf, lshUnion = union)
        .orderBy("vec_id").collect()
      assert(viaRel.toSeq == viaBc.toSeq, s"lshUnion=$union")
      assert(viaRel.nonEmpty)
    }
  }

  test("the ceiling is gone: a cells budget the collect fit refuses runs on the rel path") {
    val over = Similarity.MaxFitCells / 2 + 1
    // the collect-based fit refuses nSuper*nSubPerCell > MaxFitCells…
    val refused = intercept[IllegalArgumentException](
      Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
        nSuper = 2, nSubPerCell = over, iters = 1))
    assert(refused.getMessage.contains("MaxFitCells") ||
      refused.getMessage.contains(Similarity.MaxFitCells.toString))
    // …the relation fit runs it (actual sub count is corpus-bounded:
    // seeds are real rows, so a tiny corpus fits a huge budget cheaply)
    val rel = Similarity.kmeansTwoLevelRel(emb, "vec_id", "embedding",
      nSuper = 2, nSubPerCell = over, iters = 1)
    val assigned = Similarity.twoLevelAssignRel(emb, "vec_id", "embedding", rel)
    assert(assigned.count() == emb.count())
    // every row's witness structure still holds under the huge budget:
    // with ~one sub-centroid per row, every row is alone in its cell
    val dedup = Similarity.semanticDedupTwoLevelRel(emb, "vec_id",
      "embedding", 0.35, rel)
    assert(dedup.count() == emb.count())
  }

  test("the plan is the one we want: a join on __s, no whole-index broadcast, supers only") {
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 3, iters = 1)
    val relDf = spark.createDataFrame(indexRows(idx))
      .toDF("super_id", "sub_id", "centroid")
    val b0 = graft.operators.Similarity.indexBroadcastBuilds.get
    val assigned = Similarity.twoLevelAssignRel(emb, "vec_id", "embedding", relDf)
    // exactly ONE flat-centroid broadcast was built — the √cells
    // supers; the sub-centroids never became a broadcast index
    assert(Similarity.indexBroadcastBuilds.get == b0 + 1,
      "twoLevelAssignRel must broadcast ONLY the super centroids")
    val plan = assigned.queryExecution.optimizedPlan.toString
    assert(plan.contains("Join"), s"assignment must be a join:\n$plan")
    assert(!plan.contains("two_level_nearest_cell"),
      "the broadcast two-level kernel must not appear in the rel plan")
    assert(plan.contains("nearest_in_packed"),
      s"the packed sub argmax must drive the assignment:\n$plan")
  }

  test("contract violations are refused loudly") {
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 3, nSubPerCell = 2, iters = 1)
    val rows = indexRows(idx)
    def df(rs: Seq[(Int, Int, Seq[Double])]) =
      spark.createDataFrame(rs).toDF("super_id", "sub_id", "centroid")
    // no super rows at all
    val noSupers = intercept[IllegalArgumentException](
      Similarity.twoLevelAssignRel(emb, "vec_id", "embedding",
        df(rows.filter(_._2 >= 0))))
    assert(noSupers.getMessage.contains("sub_id = -1"))
    // a super cell with no sub rows would silently drop its corpus
    // rows from the inner join — refused up front
    val uncovered = intercept[IllegalArgumentException](
      Similarity.twoLevelAssignRel(emb, "vec_id", "embedding",
        df(rows.filterNot(r => r._1 == 1 && r._2 >= 0))))
    assert(uncovered.getMessage.contains("at least one sub row"))
    // non-contiguous sub ids fail DISTRIBUTEDLY (raise_error in the
    // packed build — the sub rows are never driver data)
    val gappy = df(rows.map(r => if (r._2 == 1) (r._1, 5, r._3) else r))
    val bad = intercept[Exception](
      Similarity.twoLevelAssignRel(emb, "vec_id", "embedding", gappy)
        .collect())
    assert(bad.getMessage.contains("contiguous"), bad.getMessage)
  }
}
