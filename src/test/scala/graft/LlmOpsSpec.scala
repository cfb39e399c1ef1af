package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** Behavior tests for the LLM-pipeline operators: crafted fixtures with
  * known answers, plus recall checks of the probabilistic (LSH) variants
  * against their exact counterparts on real testdata. */
class LlmOpsSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val docs = {
    val s = spark
    import s.implicits._
    Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
      (2L, "entirely different words about spark and scala engines"),
      (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 0
      (4L, "one two three four five six seven eight nine ten")
    ).toDF("doc_id", "text")
  }

  test("exact dedup groups identical texts") {
    val groups = Dedup.exact(docs, col("text"), col("doc_id"))
      .filter(col("group_size") > 1).collect()
    assert(groups.length == 1)
    assert(groups(0).getAs[Long]("keep_id") == 0L)
    assert(groups(0).getAs[Long]("group_size") == 2L)
  }

  test("jaccardPairs finds the planted near-dup and the exact dup") {
    val pairs = Dedup.jaccardPairs(docs, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((0L, 3L))) // exact dup: jaccard 1.0
    assert(pairs.contains((0L, 1L)) && pairs.contains((1L, 3L))) // near-dups
    assert(!pairs.exists(p => p._1 == 2L || p._2 == 2L)) // unrelated doc
  }

  test("minhashLshPairs matches exact jaccardPairs on testdata docs") {
    val real = Engine.t(spark, sf0001, "documents")
    val exact = Dedup.jaccardPairs(real, col("doc_id"), col("text"), 3, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = Dedup.minhashLshPairs(real, col("doc_id"), col("text"), 3, 16, 4, 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact) // at this similarity gap recall ~ 1 - 2e-13
  }

  test("connectedComponents: transitivity across a chain, separate components, convergence") {
    val s = spark
    import s.implicits._
    // chain 1-2, 2-3, 3-4 (diameter 3: needs >1 propagation round),
    // separate pair 10-11, and 20-21/21-22 sharing node 21
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 21L), (22L, 21L))
      .toDF("a_id", "b_id")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(Seq(1L, 2L, 3L, 4L).forall(comps(_) == 1L), s"chain: $comps")
    assert(comps(10L) == 10L && comps(11L) == 10L)
    assert(Seq(20L, 21L, 22L).forall(comps(_) == 20L))
    // pathological diameter beyond the iteration cap must fail loudly
    val longChain = (1L until 30L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    intercept[IllegalStateException] {
      Dedup.connectedComponents(longChain, maxIter = 3)
    }
  }

  test("connectedComponents: reliable checkpoint dir yields identical components; string ids fail fast") {
    val s = spark
    import s.implicits._
    val pairs = Seq((2L, 1L), (2L, 3L), (4L, 3L), (10L, 11L), (20L, 21L), (22L, 21L))
      .toDF("a_id", "b_id")
    val local = Dedup.connectedComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // the real-cluster path: lineage truncation through a RELIABLE
    // checkpoint (survives executor loss, unlike localCheckpoint)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val prev = Option(s.sparkContext.getCheckpointDir).flatten
    try {
      s.sparkContext.setCheckpointDir(dir)
      val reliable = Dedup.connectedComponents(pairs, reliableCheckpoint = true)
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(reliable == local)
    } finally prev.foreach(s.sparkContext.setCheckpointDir)
    // non-integral ids must be rejected, not silently cast to NULL and
    // dropped from the edge set (r4 advisory)
    val strPairs = Seq(("a", "b"), ("b", "c")).toDF("a_id", "b_id")
    val err = intercept[IllegalArgumentException] {
      Dedup.connectedComponents(strPairs)
    }
    assert(err.getMessage.contains("integral"), err.getMessage)
  }

  test("clusters: pairs collapse transitively, singletons kept, canonical = min id") {
    val out = Dedup.clusters(docs, col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size"), r.getAs[Int]("is_canonical"))).toSeq
    val byId = out.map(t => t._1 -> t).toMap
    // docs 0,1,3 are one near-dup cluster canonicalized at 0
    assert(Seq(0L, 1L, 3L).forall(i => byId(i)._2 == 0L && byId(i)._3 == 3L))
    assert(byId(0L)._4 == 1 && byId(1L)._4 == 0 && byId(3L)._4 == 0)
    // docs 2 and 4 are singletons, their own canonicals
    assert(Seq(2L, 4L).forall(i => byId(i)._2 == i && byId(i)._3 == 1L && byId(i)._4 == 1))
    // exactly one canonical per cluster
    val canonPerCluster = out.groupBy(_._2).map { case (_, g) => g.count(_._4 == 1) }
    assert(canonPerCluster.forall(_ == 1))

    // no pairs at threshold > 1: every doc is its own singleton cluster
    val allSingle = Dedup.clusters(docs, col("doc_id"), col("text"), n = 3, threshold = 1.01)
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Long]("cluster_id"),
        r.getAs[Long]("cluster_size")))
    assert(allSingle.length == 5 && allSingle.forall(t => t._1 == t._2 && t._3 == 1L))
  }

  test("clusters via LSH candidates matches exact pairs; components are partition-count independent") {
    val real = Engine.t(spark, sf0001, "documents")
    val exact = Dedup.clusters(real, col("doc_id"), col("text"), 3, 0.5)
      .select("doc_id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // LSH candidate generation (the 100 TB path) finds the same clusters
    // at this data's similarity gap (recall ≈ 1 - 2e-13, as for pairs)
    val lsh = Dedup.clusters(real, col("doc_id"), col("text"), 3, 0.5, useLsh = true)
      .select("doc_id", "cluster_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh == exact)
    // label propagation must not depend on physical partitioning
    val pairs = Dedup.jaccardPairs(real, col("doc_id"), col("text"), 3, 0.5)
    val a = Dedup.connectedComponents(pairs).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = Dedup.connectedComponents(pairs.repartition(3)).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b)
  }

  test("incrementalLshPairs finds batch-vs-corpus near-dups, never corpus-internal pairs") {
    // batch = docs 3,4; corpus = docs 0,1,2. Doc 3 is an exact dup of
    // corpus doc 0 and a near-dup of corpus doc 1; doc 4 matches nothing.
    val batch = docs.filter(col("doc_id") >= 3)
    val corpus = docs.filter(col("doc_id") < 3)
    val pairs = Dedup.incrementalLshPairs(batch, corpus, col("doc_id"), col("text"),
        n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
      .collect().map(r => (r.getAs[Long]("new_id"), r.getAs[Long]("corpus_id"),
        r.getAs[Double]("jaccard")))
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((3L, 0L), (3L, 1L)), s"got ${pairs.toSeq}")
    assert(pairs.find(p => p._2 == 0L).get._3 == 1.0) // exact dup
    // direction invariant: new_id is always from the batch
    assert(pairs.forall(_._1 >= 3L))
  }

  test("decontaminate drops train docs containing benchmark content") {
    // benchmark = doc 3; doc 0 is an exact copy (containment 1.0) and
    // doc 1 a near-dup (6 of 7 benchmark 3-grams ≈ 0.857); 2/4 unrelated
    val bench = docs.filter(col("doc_id") === 3)
    val train = docs.filter(col("doc_id") =!= 3)
    val rep = Dedup.contaminationPairs(train, bench, col("doc_id"), col("text"), 3, 0.5)
      .collect().map(r => (r.getAs[Long]("train_id"), r.getAs[Double]("containment")))
    assert(rep.map(_._1).toSet == Set(0L, 1L), s"report: ${rep.toSeq}")
    assert(rep.find(_._1 == 0L).get._2 == 1.0)
    val clean = Dedup.decontaminate(train, bench, col("doc_id"), col("text"), 3, 0.5)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 4L))
  }

  test("simhashPairs: identical docs at distance 0, near-dups close, unrelated far") {
    val pairs = Dedup.simhashPairs(docs, col("doc_id"), col("text"),
        maxHamming = 15, chunks = 16)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getAs[Int]("hamming"))).toMap
    assert(pairs((0L, 3L)) == 0)
    assert(pairs.get((0L, 1L)).exists(_ <= 15))
  }

  test("simhash of identical text is equal, of different text differs") {
    val fp = docs.select(col("doc_id"), Dedup.simhash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(0L) == fp(3L))
    assert(fp(0L) != fp(2L))
  }

  test("brute-force top-k is exact and LSH recall is measurable") {
    val emb = Engine.t(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val brute = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      "query_id", "qv", k = 5).collect()
    assert(brute.length == 50) // 10 queries x 5
    // per query, similarities are non-increasing with rank
    brute.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    val lsh = Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      "query_id", "qv", k = 5, bits = 64, bands = 16).collect()
    val bruteSet = brute.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val lshSet = lsh.map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val recall = (bruteSet intersect lshSet).size.toDouble / bruteSet.size
    // near-orthogonal random embeddings are LSH's worst case; just require
    // the pipeline produces ranked candidates and nonzero overlap
    assert(lshSet.nonEmpty)
    assert(recall > 0.0, s"recall=$recall")
  }

  test("IVF top-k probes cells and returns ranked neighbors") {
    val emb = Engine.t(spark, sf0001, "embeddings")
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val ivf = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      "query_id", "qv", k = 5, nCells = 16, nProbe = 8).collect()
    assert(ivf.nonEmpty)
    // ranked non-increasing per query
    ivf.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sims = rows.sortBy(_.getAs[Int]("rank")).map(_.getAs[Double]("cos_sim"))
      assert(sims.zip(sims.tail).forall { case (a, b) => a >= b })
    }
    // probing all cells must recover the exact brute-force answer
    val all = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      "query_id", "qv", k = 5, nCells = 16, nProbe = 16).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute2 = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
      "query_id", "qv", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(all == brute2)
  }

  test("k-means refinement tightens cells and keeps full-probe exact") {
    val emb = Engine.t(spark, sf0001, "embeddings")
      .select(col("vec_id"), col("embedding"))
    def meanIntraCellSim(ids: Seq[Long], vecs: Seq[Seq[Double]]): Double = {
      // score each corpus vector against its best cell, driver-side
      // (test-only; the operator itself never collects the corpus)
      val byId = ids.zip(vecs).toMap
      val rows = emb.collect().map { r =>
        val v = r.getSeq[Float](1).map(_.toDouble)
        def cos(a: Seq[Double], b: Seq[Double]): Double = {
          val dot = a.zip(b).map { case (x, y) => x * y }.sum
          val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
          if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
        }
        ids.map(id => cos(v, byId(id))).max
      }
      rows.sum / rows.length
    }
    val (ids0, vecs0) = Similarity.fitCentroids(emb, "vec_id", "embedding", 8)
    val (ids2, vecs2) = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 2)
    assert(ids0 == ids2) // labels stable
    val before = meanIntraCellSim(ids0, vecs0)
    val after = meanIntraCellSim(ids2, vecs2)
    assert(after >= before - 1e-9, s"k-means must not worsen cells: $before -> $after")

    // full probe stays exact regardless of centroid quality
    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val km = Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
        "query_id", "qv", k = 5, nCells = 8, nProbe = 8, kmeansIters = 2).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    val brute3 = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding",
        "query_id", "qv", k = 5).collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))).toSet
    assert(km == brute3)
  }

  test("kmeansAssign: total single assignment, agrees with driver-side argmax, no Exchange") {
    val emb = Engine.t(spark, sf0001, "embeddings").select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding", nCells = 8, iters = 2)
    val rows = assigned.collect()
    assert(rows.length == n) // every vector assigned exactly once
    val (ids, vecs) = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 2)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.sum
      val na = math.sqrt(a.map(x => x * x).sum); val nb = math.sqrt(b.map(x => x * x).sum)
      if (na == 0 || nb == 0) 0.0 else dot / (na * nb)
    }
    rows.foreach { r =>
      val v = r.getSeq[Float](1).map(_.toDouble).toSeq
      val best = ids.indices.maxBy(i => cos(v, vecs(i))) // stable: first max wins ties
      assert(r.getAs[Long]("cell_id") == ids(best),
        s"vec ${r.getLong(0)} assigned ${r.getAs[Long]("cell_id")}, expected ${ids(best)}")
    }
    // the assignment itself is a pure projection over the scan — the
    // corpus never shuffles (the fit's jobs already ran above)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"kmeansAssign must not shuffle the corpus:\n$plan")
  }

  test("kmeansAssign fixture: two planted clusters separate; fit is reproducible") {
    val s = spark
    import s.implicits._
    val emb = Seq(
      (0L, Seq(1.0f, 0.02f)), (1L, Seq(0.9f, -0.03f)), (2L, Seq(1.1f, 0.01f)),
      (3L, Seq(0.01f, 1.0f)), (4L, Seq(-0.02f, 0.95f)), (5L, Seq(0.03f, 1.05f))
    ).toDF("vec_id", "embedding")
    val byCell = Similarity.kmeansAssign(emb, "vec_id", "embedding", nCells = 2, iters = 2)
      .collect().groupBy(_.getAs[Long]("cell_id")).map { case (c, rs) =>
        c -> rs.map(_.getLong(0)).toSet
      }
    // seeds are ids 0 and 1 (both x-axis); two Lloyd rounds pull the
    // y-axis group onto its own centroid and re-collect the x group
    assert(byCell.values.toSet == Set(Set(0L, 1L, 2L), Set(3L, 4L, 5L)),
      s"unexpected clustering: $byCell")
    // reproducibility: a second independent fit lands on identical centroids
    val f1 = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 2, 2)
    val f2 = Similarity.kmeansCentroids(emb.repartition(7), "vec_id", "embedding", 2, 2)
    assert(f1 == f2, "quantized means must make the fit partition-order independent")
  }

  test("prefitted-centroids seam: kmeansAssign/semanticDedup with an index match the internal fit") {
    val emb = Engine.t(spark, sf0001, "embeddings").select(col("vec_id"), col("embedding"))
    val idx = Similarity.kmeansCentroids(emb, "vec_id", "embedding", 8, iters = 2)
    def key(rs: Array[org.apache.spark.sql.Row]) =
      rs.map(r => (r.getLong(0), r.getAs[Long]("cell_id"))).sortBy(_._1).toSeq
    val internal = key(Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, 2)
      .select(col("vec_id"), col("cell_id")).collect())
    val prefit = key(Similarity.kmeansAssign(emb, "vec_id", "embedding", 8, 2,
        centroids = Some(idx))
      .select(col("vec_id"), col("cell_id")).collect())
    assert(internal == prefit) // fit-once-serve-many equals refit (reproducible fit)
    val ddInternal = Similarity.semanticDedup(emb, "vec_id", "embedding", 8, 2, 0.35)
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cell_id"),
        Option(r.get(2)))).sortBy(_._1).toSeq
    val ddPrefit = Similarity.semanticDedup(emb, "vec_id", "embedding", 8, 2, 0.35,
        centroids = Some(idx))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("cell_id"),
        Option(r.get(2)))).sortBy(_._1).toSeq
    assert(ddInternal == ddPrefit)
  }

  test("two-level k-means: total assignment, sound within-cell dedup, reproducible fit") {
    val emb = Engine.t(spark, sf0001, "embeddings").select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 4, nSubPerCell = 3, iters = 2)
    assert(idx._1.size == 4 && idx._2.size == 4 && idx._2.forall(_.size <= 3))
    val assigned = Similarity.twoLevelAssign(emb, "vec_id", "embedding", idx)
    val rows = assigned.collect()
    assert(rows.length == n) // every vector assigned exactly once
    // assignment is a pure projection — the corpus never shuffles
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"two-level assign must not shuffle:\n$plan")
    // dedup over the composite cells: one verdict per vector, every
    // witness a true in-cell >= tau lower-id pair
    val tau = 0.35
    val dd = Similarity.semanticDedupTwoLevel(emb, "vec_id", "embedding",
      nSuper = 4, nSubPerCell = 3, iters = 2, threshold = tau,
      index = Some(idx)).collect()
    assert(dd.length == n)
    val cellOf = dd.map(r => r.getLong(0) -> r.getAs[Long]("cell_id")).toMap
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", tau, lsh = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dups = dd.filter(!_.isNullAt(2))
    assert(dups.nonEmpty)
    dups.foreach { r =>
      val (id, w) = (r.getLong(0), r.getAs[Long]("dup_of"))
      assert(w < id && cellOf(w) == cellOf(id))
      assert(exact.contains((w, id)), s"($w,$id) must be a true cosine>=$tau pair")
    }
    // reproducibility: refit on a repartitioned corpus is bit-identical
    val idx2 = Similarity.kmeansTwoLevel(emb.repartition(7), "vec_id", "embedding",
      nSuper = 4, nSubPerCell = 3, iters = 2)
    assert(idx == idx2, "quantized means must make the two-level fit deterministic")
    // index-size guard
    val big = intercept[IllegalArgumentException](
      Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
        nSuper = 1024, nSubPerCell = 1024, iters = 0))
    assert(big.getMessage.contains("nSuper"))
  }

  test("semanticDedup: witnesses are valid, kept set is sound, subset of exact pairs") {
    val emb = Engine.t(spark, sf0001, "embeddings")
    val tau = 0.35
    val dd = Similarity.semanticDedup(emb, "vec_id", "embedding",
      nCells = 8, iters = 2, threshold = tau).collect()
    assert(dd.length == emb.count()) // one verdict per vector
    val cellOf = dd.map(r => r.getLong(0) -> r.getAs[Long]("cell_id")).toMap
    val dups = dd.filter(!_.isNullAt(2))
    assert(dups.nonEmpty, "sf0.001 has within-cell pairs >= 0.35 (84 measured)")
    // exact global pairs at the same threshold (the dedup_embedding truth)
    val exact = Similarity.cosinePairs(emb, "vec_id", "embedding", tau, lsh = false)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    dups.foreach { r =>
      val (id, w) = (r.getLong(0), r.getAs[Long]("dup_of"))
      assert(w < id, "witness must be the lower id")
      assert(cellOf(w) == cellOf(id), "witness must share the cell")
      assert(exact.contains((w, id)), s"($w,$id) must be a true cosine>=$tau pair")
    }
    // soundness of keeps: a kept vector has NO lower-id cell-mate at >= tau
    val dupIds = dups.map(_.getLong(0)).toSet
    exact.foreach { case (a, b) =>
      if (cellOf(a) == cellOf(b)) assert(dupIds.contains(b),
        s"in-cell pair ($a,$b) at >=$tau must mark $b as dup")
    }
  }

  test("SQ8: quantize/dequantize bounds error, full oversample = brute force, practical recall") {
    val emb = Engine.t(spark, sf0001, "embeddings")
    val (los, his) = Similarity.sq8Bounds(emb, "embedding")
    assert(los.size == 64 && his.size == 64 && los.zip(his).forall { case (l, h) => l <= h })
    // reconstruction error bounded by half a quantization step per dim
    val maxStep = los.zip(his).map { case (l, h) => (h - l) / 255.0 / 2.0 }.max
    val maxErr = emb
      .withColumn("dq", Similarity.sq8Dequantize(
        Similarity.sq8Quantize(col("embedding"), los, his), los, his))
      .select(expr("""
        aggregate(zip_with(cast(embedding as array<double>), dq, (a, b) -> abs(a - b)),
                  cast(0.0 as double), (acc, x) -> greatest(acc, x))""").as("e"))
      .agg(max(col("e"))).head.getDouble(0)
    assert(maxErr <= maxStep * 1.0001, s"reconstruction error $maxErr > half-step $maxStep")

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.bruteForceTopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5))
    // full oversample: exact by construction
    val full = ids(Similarity.sq8TopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5, oversample = 100))
    assert(full == brute)
    // practical oversample: high recall (SQ8 error is tiny vs neighbor gaps)
    val approx = ids(Similarity.sq8TopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5, oversample = 4))
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall >= 0.8, s"SQ8 oversample=4 recall $recall < 0.8")
  }

  test("PQ: Lloyd refinement lowers reconstruction error, full oversample = brute force, practical recall") {
    val emb = Engine.t(spark, sf0001, "embeddings")

    // encode/decode roundtrip shape: m codes, each in 1..ksub; decoded
    // vector has the original dimensionality
    val books0 = Similarity.pqFit(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 0)
    assert(books0.size == 8 && books0.forall(b => b.size == 16 && b.forall(_.size == 8)))
    val enc = emb.select(Similarity.pqEncode(col("embedding"), books0).as("codes"))
    val shapes = enc.select(size(col("codes")).as("n"),
        expr("aggregate(codes, true, (acc, c) -> acc and c >= 1 and c <= 16)").as("inRange"))
      .agg(min(col("n")), max(col("n")), min(col("inRange"))).head
    assert(shapes.getInt(0) == 8 && shapes.getInt(1) == 8 && shapes.getBoolean(2))

    // k-means refinement must not hurt the fit: mean squared
    // reconstruction error is non-increasing in Lloyd iterations
    // (each round reassigns to nearest codeword then recenters)
    def mse(books: Seq[Seq[Seq[Double]]]): Double = emb
      .withColumn("dq", Similarity.pqDecode(
        Similarity.pqEncode(col("embedding"), books), books))
      .select(expr("""
        aggregate(zip_with(cast(embedding as array<double>), dq, (a, b) -> (a - b) * (a - b)),
                  cast(0.0 as double), (acc, x) -> acc + x)""").as("e"))
      .agg(avg(col("e"))).head.getDouble(0)
    val books2 = Similarity.pqFit(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 2)
    assert(mse(books2) <= mse(books0) * 1.0001,
      "Lloyd-refined codebook reconstructs worse than its init")

    val queries = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    def ids(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
      df.select("query_id", "neighbor_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = ids(Similarity.bruteForceTopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5))
    // full oversample: exact by construction, whatever the codebook
    val full = ids(Similarity.pqTopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5, oversample = 100))
    assert(full == brute)
    // practical oversample: recall is measurable and nontrivial — PQ at
    // 32× compression on UNIFORM-random vectors is the worst case
    // (every subspace distance is noise-dominated), so the bar here is
    // deliberately the sanity floor, not the clustered-corpus figure
    val approx = ids(Similarity.pqTopK(emb.select(col("vec_id"), col("embedding")),
      queries, "vec_id", "embedding", "query_id", "qv", k = 5, oversample = 4))
    val recall = (approx & brute).size.toDouble / brute.size
    assert(recall > 0.0, s"PQ oversample=4 recall $recall")
  }

  test("unigramLmScore: OOV-heavy docs score at the floor, in-vocab docs above it") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "a a a b"), (1L, "a b a b"), (2L, "zz yy xx ww"))
      .toDF("doc_id", "text")
    // topK=2 keeps only {a, b}; doc 2 is then entirely out-of-vocabulary
    val scores = TextAnalysis.unigramLmScore(d, col("doc_id"), col("text"), topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(2L) == -10.0)
    assert(scores(0L) > scores(2L) && scores(1L) > scores(2L))
    // deterministic re-run
    val again = TextAnalysis.unigramLmScore(d, col("doc_id"), col("text"), topK = 2)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(again == scores)
  }

  test("duplicateSpans: cross-doc and self-repeat spans, interval merge, clean docs zero") {
    val s = spark
    import s.implicits._
    def words(prefix: String, n: Int): String = (1 to n).map(prefix + _).mkString(" ")
    val shared = "s1 s2 s3 s4" // 4 tokens, shared between docs 0 and 1
    val d = Seq(
      (0L, s"${words("a", 3)} $shared ${words("b", 3)}"),   // 10 tokens, one shared span
      (1L, s"${words("c", 5)} $shared"),                     // 9 tokens, same span at the end
      (2L, s"$shared $shared ${words("d", 4)}"),             // self-repeat: two overlapping hits
      (3L, words("z", 12)))                                  // all unique -> clean
      .toDF("doc_id", "text")
    val out = operators.Dedup.duplicateSpans(d, $"doc_id", $"text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getDouble(3)))).toMap
    // docs 0/1: the 4-token shared run is one span of exactly 4 tokens
    assert(out(0L) == ((1L, 4L, 0.4)))
    assert(out(1L) == ((1L, 4L, round6(4.0 / 9))))
    // doc 2: "s1 s2 s3 s4 s1 s2 s3 s4 ..." — duplicated grams at pos 1
    // and pos 5; the windows [1,4] and [5,8] touch but do not overlap,
    // so they stay two spans covering the first 8 tokens
    assert(out(2L)._1 == 2L && out(2L)._2 == 8L)
    assert(out(3L) == ((0L, 0L, 0.0)))
  }

  test("duplicateSpans: k longer than every doc yields all-zero stats, full keep on cut") {
    val s = spark
    import s.implicits._
    val d = Seq((0L, "a b c"), (1L, "a b c")).toDF("doc_id", "text") // exact dups, but < k tokens
    val stats = operators.Dedup.duplicateSpans(d, $"doc_id", $"text", k = 8)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(stats.forall(_ == ((0L, 0L, 0.0))))
    val cut = operators.Dedup.exciseDuplicateSpans(d, $"doc_id", $"text", k = 8)
      .collect().map(r => r.getString(1))
    assert(cut.forall(_ == "a b c"))
  }

  test("exciseDuplicateSpans: cuts exactly the spans, keeps clean docs verbatim") {
    val s = spark
    import s.implicits._
    def words(prefix: String, n: Int): String = (1 to n).map(prefix + _).mkString(" ")
    val shared = "s1 s2 s3 s4"
    val d = Seq(
      (0L, s"${words("a", 3)} $shared ${words("b", 3)}"),
      (1L, s"${words("c", 5)} $shared"),
      (2L, shared), // 4 tokens: fully duplicated (also appears in 0/1) -> empty
      (3L, words("z", 12)))
      .toDF("doc_id", "text")
    val out = operators.Dedup.exciseDuplicateSpans(d, $"doc_id", $"text", k = 4)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) == (("a1 a2 a3 b1 b2 b3", 6L)))
    assert(out(1L) == (("c1 c2 c3 c4 c5", 5L)))
    assert(out(2L) == (("", 0L)))
    assert(out(3L) == ((words("z", 12), 12L)))
  }

  test("exciseDuplicateSpans: gap-walk cut is exact on adversarial alternating-span docs") {
    val s = spark
    import s.implicits._
    // the worst case for the per-token-exists form this replaced:
    // duplicate k-gram blocks alternating with unique tokens, so
    // n_spans ∝ n_tokens/k. Doc 0 = D1 u1 D2 u2 ... D40 u40 (each D_i
    // a k=3-token block also present in doc 1); doc 1 = the 40 blocks
    // concatenated. Every within-block gram is duplicated, every gram
    // crossing a block/unique boundary is unique, so the spans are
    // exactly the D blocks: doc 0 keeps exactly its u tokens, doc 1
    // keeps nothing.
    val k = 3
    val blocks = (1 to 40).map(b => (1 to k).map(j => s"d${b}_$j").mkString(" "))
    val uniques = (1 to 40).map(b => s"u$b")
    val doc0 = blocks.zip(uniques).map { case (d, u) => s"$d $u" }.mkString(" ")
    val doc1 = blocks.mkString(" ")
    val d = Seq((0L, doc0), (1L, doc1)).toDF("doc_id", "text")
    val out = operators.Dedup.exciseDuplicateSpans(d, $"doc_id", $"text", k)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    assert(out(0L) == ((uniques.mkString(" "), 40L)))
    assert(out(1L) == (("", 0L)))
    val stats = operators.Dedup.duplicateSpans(d, $"doc_id", $"text", k)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(stats(0L) == ((40L, 120L)))
  }

  test("duplicateSpans/exciseDuplicateSpans: digest-keyed gram join equals the string-keyed path") {
    val real = Engine.t(spark, sf0001, "documents")
    def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    assert(
      canon(operators.Dedup.duplicateSpans(real, col("doc_id"), col("text"), k = 8,
        digestKeyed = true)) ==
      canon(operators.Dedup.duplicateSpans(real, col("doc_id"), col("text"), k = 8)))
    assert(
      canon(operators.Dedup.exciseDuplicateSpans(real, col("doc_id"), col("text"), k = 8,
        digestKeyed = true)) ==
      canon(operators.Dedup.exciseDuplicateSpans(real, col("doc_id"), col("text"), k = 8)))
  }

  test("repetitionStats: known fractions on crafted docs, no shuffle in the plan") {
    val s = spark
    import s.implicits._
    val d = Seq(
      (0L, "a b c d"),        // all distinct: dup 0, top 1/4, 2gram dup 0
      (1L, "a a a a"),        // one token: dup 3/4, top 1, 2gram dup 2/3
      (2L, "x y x y x"))      // alternating: dup 3/5, top 3/5, 2grams all dup'd but 2 distinct of 4
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats($"doc_id", $"text")
    val rows = d.select(out: _*).collect()
      .map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(rows(0L) == ((0.0, 0.25, 0.0)))
    assert(rows(1L) == ((0.75, 1.0, round6(1.0 - 1.0 / 3))))
    assert(rows(2L) == ((round6(1.0 - 2.0 / 5), round6(3.0 / 5), 0.5)))
    // zero-shuffle: a pure projection over the scan
    val plan = d.select(out: _*).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("repetitionStats: sorted-run top_word_frac equals brute-force max frequency on random docs") {
    val s = spark
    import s.implicits._
    // deterministic pseudo-random docs over a small vocabulary (forces
    // heavy ties/runs), incl. the degenerate single- and all-same-token
    // shapes the "" sort sentinel has to survive
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "a a".replace(" ", ""), "z9", "Q")
    val docs = (0L until 60L).map { i =>
      val n = 1 + rnd.nextInt(40)
      i -> (0 until n).map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" ")
    } :+ (60L -> "only") :+ (61L -> "same same same same")
    val d = docs.toDF("doc_id", "text")
    val got = d.select(TextAnalysis.repetitionStats($"doc_id", $"text"): _*)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    docs.foreach { case (id, text) =>
      val toks = text.split(" ", -1)
      val expected = round6(toks.groupBy(identity).map(_._2.length).max.toDouble / toks.length)
      assert(got(id) == expected, s"doc $id: '$text'")
    }
  }

  test("charEntropy: sorted-run fold is bit-identical to the naive per-distinct-char form") {
    val s = spark
    import s.implicits._
    // the naive O(u·n) form the fold replaced — kept here as the
    // equivalence oracle (same term order: sorted distinct chars; same
    // p = count/n; same ln(p)/ln(2) log2)
    def naive(text: Column): Column = {
      val cs = split(text, "")
      val n = length(text).cast("double")
      round(
        aggregate(array_sort(array_distinct(cs)), lit(0.0),
          (acc, ch) => {
            val p = size(filter(cs, c => c === ch)).cast("double") / n
            acc + -p * (log(p) / log(lit(2.0)))
          }), 6)
    }
    val rnd = new scala.util.Random(7)
    // random unicode docs: latin, CJK, emoji-range, mixed, plus the
    // degenerate single-char and all-same shapes
    val alphabets = Vector(
      "abcdefghij", "的是在了和一个人我不", "αβγδε", "!@#$% ^&*()",
      "ab的α!x yz")
    val docs = (0L until 80L).map { i =>
      val alpha = alphabets(rnd.nextInt(alphabets.size))
      val len = 1 + rnd.nextInt(60)
      i -> (0 until len).map(_ => alpha(rnd.nextInt(alpha.length))).mkString
    } :+ (80L -> "x") :+ (81L -> "aaaaaaaa")
    val d = docs.toDF("doc_id", "text")
    val got = d.select($"doc_id", TextAnalysis.charEntropy($"text").as("e"),
        naive($"text").as("ref"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(1)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(2)),
        s"doc ${r.getLong(0)}: fold ${r.getDouble(1)} != naive ${r.getDouble(2)}")
    }
    // still a pure zero-shuffle projection
    val plan = d.select(TextAnalysis.charEntropy($"text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  private def round6(d: Double): Double = math.round(d * 1e6) / 1e6

  test("langId picks en for english stopwords, und for none") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, "the cat and the dog"), (2, "der hund und die katze ist"),
      (3, "zzz qqq www")).toDF("id", "t")
      .select(col("id"), TextAnalysis.langId(col("t")).as("lang"))
    val m = df.collect().map(r => r.getInt(0) -> r.getString(1)).toMap
    assert(m(1) == "en")
    assert(m(2) == "de")
    assert(m(3) == "und")
  }

  test("quality score is in [0,1] and penalizes punctuation soup") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, "the quick brown fox jumps over the lazy dog and runs to the hills"),
      (2, "!!!???...,,,;;;:::!!!???...,,,;;;:::")).toDF("id", "t")
      .select(col("id"), TextAnalysis.qualityScore(col("t")).as("q"))
    val m = df.collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(m.values.forall(v => v >= 0.0 && v <= 1.0))
    assert(m(1) > m(2))
  }

  test("token counts: whitespace vs bpe-ish") {
    val s = spark
    import s.implicits._
    val df = Seq((1, "hello, world! it's fine")).toDF("id", "t")
      .select(
        TextAnalysis.tokenCount(col("t")).as("ws"),
        TextAnalysis.bpeishTokenCount(col("t")).as("bpe"))
    val r = df.collect()(0)
    assert(r.getAs[Int]("ws") == 4)
    // hello , world ! it ' s fine = 8
    assert(r.getAs[Int]("bpe") == 8)
  }

  test("fingerprints: normalization-invariant md5 vs order-sensitive rolling") {
    val s = spark
    import s.implicits._
    val df = Seq(
      (1, "Hello,   World!"), (2, "hello world"), (3, "world hello"))
      .toDF("id", "t")
      .select(col("id"),
        TextAnalysis.fingerprint(col("t")).as("fp"),
        TextAnalysis.rollingFingerprint(col("t")).as("rfp"))
    val rows = df.collect().map(r => r.getInt(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(rows(1)._1 == rows(2)._1) // punctuation/case-insensitive
    assert(rows(2)._1 != rows(3)._1) // order matters for md5 of text
    assert(rows(2)._2 != rows(3)._2) // rolling hash is order-sensitive
  }

  test("multimodal: frame fan-out covers bytes and features are normalized") {
    val media = Multimodal.packDocsAsMedia(
      Engine.t(spark, sf0001, "documents").filter(col("doc_id") < 10))
    val frames = Multimodal.frameSample(media)
    val byDoc = frames.groupBy(col("media_id"))
      .agg(count(lit(1)).as("n"), sum(col("frame_n_bytes")).as("bytes"))
      .join(media.select(col("media_id"), col("meta.n_frames").as("nf"),
        octet_length(col("data")).as("len")), "media_id")
      .collect()
    byDoc.foreach { r =>
      assert(r.getAs[Long]("n") == r.getAs[Int]("nf").toLong)
      assert(r.getAs[Long]("bytes") <= r.getAs[Int]("len"))
      assert(r.getAs[Long]("bytes") >= r.getAs[Int]("len") - r.getAs[Int]("nf"))
    }
    val feats = Multimodal.extractFeatures(media).select(col("features")).collect()
    feats.foreach { r =>
      val v = r.getSeq[Float](0)
      assert(v.length == 16)
      assert(math.abs(v.sum - 1.0f) < 1e-3) // L1-normalized
    }
  }

  test("multimodal decode stub is deterministic") {
    val media = Multimodal.packDocsAsMedia(
      Engine.t(spark, sf0001, "documents").filter(col("doc_id") < 10))
    val a = Multimodal.decodeStub(spark, media).select("media_id", "content_hash").collect()
    val b = Multimodal.decodeStub(spark, media).select("media_id", "content_hash").collect()
    assert(a.map(_.toString).sorted.sameElements(b.map(_.toString).sorted))
  }

  test("multimodal decode stub adds no shuffle (pure projection)") {
    val media = Multimodal.packDocsAsMedia(
      Engine.t(spark, sf0001, "documents").filter(col("doc_id") < 10))
    val df = Multimodal.decodeStub(spark, media)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Exchange"), s"decode must be a narrow projection:\n$p")
  }

  test("decodeWithCodec seam: per-partition codec matches the stub kernel") {
    import spark.implicits._
    val media = Multimodal.packDocsAsMedia(
      Engine.t(spark, sf0001, "documents").filter(col("doc_id") < 10))
    // a "codec" that computes the same n_bytes/fnv the stub projection
    // computes — proves the mapPartitions plug-in point carries batches
    // with the same schema/shape a real decoder would see
    val viaCodec = Multimodal.decodeWithCodec(media) { rows =>
      rows.map { r =>
        val bytes = r.getAs[Array[Byte]]("data")
        (r.getAs[Long]("media_id"), bytes.length,
          graft.functions.expressions.StableHash.fnv1a64(bytes))
      }
    }.toDF("media_id", "n_bytes", "content_hash")
    val viaExpr = Multimodal.decodeStub(spark, media)
      .select(col("media_id"), col("n_bytes"), col("content_hash"))
    assert(viaCodec.collect().map(_.toString).sorted
      .sameElements(viaExpr.collect().map(_.toString).sorted))
  }

  test("ANN fit collects are bounded: oversized nCells/ksub refuse up front") {
    // the fits collect nCells (resp. ksub) vectors to the driver and
    // broadcast them inside the plan — a caller must not be able to
    // turn that into a corpus-sized collect
    val s = spark
    import s.implicits._
    val emb = Seq((0L, Seq(1.0f, 0.0f)), (1L, Seq(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val e1 = intercept[IllegalArgumentException](
      Similarity.fitCentroids(emb, "vec_id", "embedding",
        nCells = Similarity.MaxFitCells + 1))
    assert(e1.getMessage.contains("nCells"))
    intercept[IllegalArgumentException](
      Similarity.fitCentroids(emb, "vec_id", "embedding", nCells = 0))
    val e2 = intercept[IllegalArgumentException](
      Similarity.pqFit(emb, "vec_id", "embedding", m = 2, ksub = 65537))
    assert(e2.getMessage.contains("ksub"))
    // the refusal happens BEFORE any job runs, and in-bound fits work
    val (ids, vecs) = Similarity.fitCentroids(emb, "vec_id", "embedding", 2)
    assert(ids == Seq(0L, 1L) && vecs.length == 2)
  }

  test("Lloyd mean-collect is bounded by cells×dim, not just cells (r13 verdict)") {
    // MaxFitCells bounds the cell count; the per-round mean collect
    // also grows with DIMENSION — 131k cells × 768 dims would be ~100M
    // driver doubles. The guard is conservative (requested nCells ×
    // actual dim) so it fires before any Lloyd round runs.
    val s = spark
    import s.implicits._
    val dim = 2048
    val hi = Seq.tabulate(3)(i =>
      (i.toLong, Seq.fill(dim)(i.toDouble))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      Similarity.kmeansCentroids(hi, "vec_id", "embedding",
        nCells = 16384, iters = 1)) // 16384*2048 = 33.5M > 2^24
    assert(e.getMessage.contains("nCells*dim"), e.getMessage)
    val e2 = intercept[IllegalArgumentException](
      Similarity.kmeansTwoLevel(hi, "vec_id", "embedding",
        nSuper = 2, nSubPerCell = 8192, iters = 1)) // 2*8192*2048 > 2^24
    assert(e2.getMessage.contains("nCells*dim"), e2.getMessage)
    // in-bound high-dim fits still run (3 cells × 2048 dims)
    val (_, vecs3) = Similarity.kmeansCentroids(hi, "vec_id", "embedding",
      nCells = 3, iters = 1)
    assert(vecs3.length == 3 && vecs3.forall(_.length == dim))
  }

  test("twoLevelAssign stride matches the fit's Lloyd stride on a ragged index (r13 advice)") {
    val s = spark
    import s.implicits._
    // 2 far-apart super clusters with UNEQUAL populations: the small
    // one seeds fewer than nSubPerCell sub-centroids, so the index is
    // ragged and the stride (max actual sub count) < nSubPerCell
    val rows =
      Seq.tabulate(8)(i => (i.toLong, Seq(10.0 + (i % 4) * 0.1, 0.0, 1.0))) ++
      Seq((100L, Seq(-10.0, 0.2, 1.0)), (101L, Seq(-10.0, 0.1, 1.0)))
    val emb = rows.toDF("vec_id", "embedding")
    val idx = Similarity.kmeansTwoLevel(emb, "vec_id", "embedding",
      nSuper = 2, nSubPerCell = 4, iters = 2)
    val stride = idx._2.map(_.size).max
    assert(stride <= 4)
    val assigned = Similarity.twoLevelAssign(emb, "vec_id", "embedding", idx)
      .collect().map(r => r.getLong(0) -> r.getAs[Long]("cell_id")).toMap
    // cell ids decompose under the INDEX's stride: super = cell/stride
    // is a valid super index, sub = cell%stride indexes that super's
    // actual sub list (the documented contract — NOT nSubPerCell)
    assigned.values.foreach { cell =>
      val sup = (cell / stride).toInt; val sub = (cell % stride).toInt
      assert(sup >= 0 && sup < idx._2.size, s"super $sup out of range")
      assert(sub >= 0 && sub < idx._2(sup).size,
        s"sub $sub exceeds super $sup's actual ${idx._2(sup).size} sub-cells")
    }
    // two batches assigned against the same index agree on cell ids
    val again = Similarity.twoLevelAssign(emb.repartition(3), "vec_id",
      "embedding", idx).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("cell_id")).toMap
    assert(again == assigned)
  }
}
