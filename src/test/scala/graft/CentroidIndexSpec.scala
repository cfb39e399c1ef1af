package graft

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expressions.{FlatCentroids, NearestCentroid,
  NearestCentroids, TwoLevelFlatIndex, TwoLevelNearestCell}
import graft.operators.Similarity

/** The broadcast argmax kernel (CentroidIndex.scala) replaced the
  * plan-literal form `array_max(transform(typedlit(cells), (c,i) =>
  * struct(cosine(vec,c), -i-1)))` — these specs pin the two forms
  * EQUAL on data that exercises every ordering rule: NULL input
  * vectors, zero-norm centroids (NULL sim), exact ties, float and
  * double element types, and ragged two-level sub-cells. The literal
  * form is rebuilt inline here as the executable spec of record. */
class CentroidIndexSpec extends AnyFunSuite {
  import TestSpark._

  // the replaced formula, verbatim (sim desc, tie -> lowest index)
  private def literalArgmax(cells: Seq[Seq[Double]], vec: Column): Column =
    -array_max(transform(typedlit(cells), (c, i) =>
      struct(Similarity.cosine(vec, c).as("sim"), (-i - 1).as("negidx"))))
      .getField("negidx") - 1

  private def literalTopN(cells: Seq[Seq[Double]], vec: Column, n: Int): Column =
    transform(
      slice(sort_array(transform(typedlit(cells), (c, i) =>
        struct(Similarity.cosine(vec, c).as("sim"), (-i - 1).as("negidx"))),
        asc = false), 1, n),
      e => -e.getField("negidx") - 1)

  // vectors chosen to force ties (v2 == v3 direction), zero norms, nulls
  private val cells: Seq[Seq[Double]] = Seq(
    Seq(1.0, 0.0, 0.0),
    Seq(0.0, 1.0, 0.0),
    Seq(0.0, 2.0, 0.0), // same direction as cell 1 -> exact cosine tie
    Seq(0.0, 0.0, 0.0), // zero norm -> NULL sim for every vector
    Seq(-1.0, -1.0, 0.0))

  private def vecsDf(asFloat: Boolean): DataFrame = {
    val rows = Seq[(Long, Option[Seq[Double]])](
      (0L, Some(Seq(1.0, 0.1, 0.0))),
      (1L, Some(Seq(0.0, 5.0, 0.0))), // ties cells 1 and 2 exactly
      (2L, Some(Seq(-1.0, -0.9, 0.1))),
      (3L, None), // NULL vector -> index 0 / prefix of indexes
      (4L, Some(Seq(0.0, 0.0, 0.0))), // zero-norm input -> all sims NULL
      (5L, Some(Seq(0.3, -0.2, 0.9))))
    val df = spark.createDataFrame(rows).toDF("id", "vec")
    if (asFloat) df.select(col("id"), col("vec").cast("array<float>").as("vec"))
    else df
  }

  private def flat(cells: Seq[Seq[Double]]): FlatCentroids = {
    val dim = cells.head.size
    FlatCentroids(dim, cells.flatten.toArray,
      Array.tabulate(cells.size)(_.toLong))
  }

  for (asFloat <- Seq(false, true)) {
    val label = if (asFloat) "float" else "double"
    test(s"NearestCentroid == literal argmax over $label vectors (ties, nulls, zero norms)") {
      val df = vecsDf(asFloat)
      val bc = spark.sparkContext.broadcast(flat(cells))
      val got = df.select(col("id"),
          org.apache.spark.sql.GraftColumnBridge.toCol(NearestCentroid(
            org.apache.spark.sql.GraftColumnBridge.toExpr(col("vec")), bc)).as("idx"))
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getInt(1)))
      val want = df.select(col("id"),
          literalArgmax(cells, col("vec")).cast("int").as("idx"))
        .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getInt(1)))
      assert(got.toSeq == want.toSeq)
      // spot semantics: the exact tie resolves to the LOWER index (1 not 2)
      assert(got(1)._2 == 1)
      // NULL vector and zero-norm vector resolve to index 0
      assert(got(3)._2 == 0 && got(4)._2 == 0)
    }

    test(s"NearestCentroids(top-n) == literal sort/slice over $label vectors") {
      val df = vecsDf(asFloat)
      val bc = spark.sparkContext.broadcast(flat(cells))
      for (n <- Seq(1, 3, 5, 9)) { // n > nCells exercises the clamp
        val got = df.select(col("id"),
            org.apache.spark.sql.GraftColumnBridge.toCol(NearestCentroids(
              org.apache.spark.sql.GraftColumnBridge.toExpr(col("vec")), bc, n)).as("ix"))
          .orderBy(col("id")).collect()
          .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
        val want = df.select(col("id"),
            literalTopN(cells, col("vec"), n).cast("array<int>").as("ix"))
          .orderBy(col("id")).collect()
          .map(r => (r.getLong(0), r.getSeq[Int](1).toSeq))
        assert(got.toSeq == want.toSeq, s"n=$n")
      }
    }
  }

  test("TwoLevelNearestCell == per-level literal argmaxes on a ragged index") {
    val superVecs: Seq[Seq[Double]] =
      Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val subVecs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 0.2, 0.0), Seq(1.0, -0.2, 0.0), Seq(0.9, 0.0, 0.4)),
      Seq(Seq(0.1, 1.0, 0.0))) // ragged: 3 vs 1 sub-cells
    val stride = subVecs.map(_.size).max.toLong
    val counts = subVecs.map(_.size).toArray
    val offsets = counts.scanLeft(0)(_ + _).dropRight(1)
    val dim = 3
    val bc = spark.sparkContext.broadcast(TwoLevelFlatIndex(
      dim, stride, superVecs.flatten.toArray, superVecs.size,
      subVecs.flatten.flatten.toArray, offsets, counts))
    val df = vecsDf(asFloat = false).filter(col("vec").isNotNull)
    val got = df.select(col("id"),
        org.apache.spark.sql.GraftColumnBridge.toCol(TwoLevelNearestCell(
          org.apache.spark.sql.GraftColumnBridge.toExpr(col("vec")), bc)).as("cell"))
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val s = literalArgmax(superVecs, col("vec")).cast("int")
    // per-level literal reference: super argmax, then argmax within the
    // row's super cell's sub list
    val want = df.select(col("id"), s.as("s"), col("vec")).collect().map { r =>
      val si = r.getInt(1)
      val one = df.filter(col("id") === r.getLong(0))
        .select(literalArgmax(subVecs(si), col("vec")).cast("long").as("b"))
        .collect().head.getLong(0)
      (r.getLong(0), si.toLong * stride + one)
    }
    assert(got.toSeq == want.toSeq)
  }

  test("an index with an empty sub-cell list is refused, not silently mapped to sub 0") {
    val superVecs: Seq[Seq[Double]] = Seq(Seq(1.0, 0.0), Seq(0.0, 1.0))
    val subVecs: Seq[Seq[Seq[Double]]] = Seq(Seq(Seq(1.0, 0.1)), Seq())
    val df = spark.range(3).select(col("id"),
      array(lit(1.0), lit(0.5)).as("vec"))
    val e = intercept[IllegalArgumentException](
      Similarity.twoLevelAssign(df, "id", "vec", (superVecs, subVecs)))
    assert(e.getMessage.contains("sub-centroid"), e.getMessage)
  }

  test("the cells×dim guard fires on the iters=0 fit path too (ivfAssign default)") {
    // 131072 cells × 200 dims = 26M elements > MaxFitElements (2^24):
    // the single-row dim probe must reject BEFORE the big collect
    val df = spark.range(10).select(col("id"),
      transform(sequence(lit(0), lit(199)),
        i => (col("id") + i).cast("double")).as("vec"))
    val e = intercept[IllegalArgumentException](
      Similarity.fitCentroids(df, "id", "vec", nCells = 131072))
    assert(e.getMessage.contains("fitCentroids"), e.getMessage)
  }

  test("twoLevelAssign against the 20M-shape dials stays a broadcast plan (no typedlit blow-up)") {
    // a tiny corpus against a LARGE fabricated index: the plan string
    // must stay small (the literal form inlined every centroid)
    val nSuper = 64; val nSub = 64; val dim = 8
    val superVecs = Seq.tabulate(nSuper)(s => Seq.tabulate(dim)(i => (s * 31 + i * 7 % 13 + 1).toDouble))
    val subVecs = Seq.tabulate(nSuper)(s => Seq.tabulate(nSub)(b =>
      Seq.tabulate(dim)(i => ((s * 61 + b * 17 + i * 3) % 19 + 1).toDouble)))
    // spark.range is a real scan, so the projection can't be
    // constant-folded into a LocalTableScan
    val df = spark.range(5).select(col("id"),
      transform(sequence(lit(0), lit(dim - 1)),
        i => (col("id") * 7 + i * 3 + 1).cast("float")).as("vec"))
    val out = Similarity.twoLevelAssign(df, "id", "vec", (superVecs, subVecs))
    assert(out.count() == 5)
    val planStr = out.queryExecution.executedPlan.toString
    assert(planStr.contains("two_level_nearest_cell"), planStr.take(500))
    assert(planStr.length < 20000, s"plan unexpectedly large: ${planStr.length}")
  }

  // ── r15 guards: corrupt centroid sets fail loudly at FIT time ──

  test("a NULL centroid among the fitted set is rejected naming the offending id") {
    // the flat kernel indexes c*dim+i blindly, so a NULL seed (a NULL
    // embedding row among the lowest ids) must be refused at index
    // build, not NPE mid-task
    val e = intercept[IllegalArgumentException](
      Similarity.indexOf(spark, (Seq(1L, 2L), Seq(Seq(1.0, 2.0), null))))
    assert(e.getMessage.contains("id=2") && e.getMessage.contains("NULL"),
      e.getMessage)
  }

  test("a short (ragged) centroid is rejected naming its length and the index dim") {
    val e = intercept[IllegalArgumentException](
      Similarity.indexOf(spark, (Seq(1L, 2L), Seq(Seq(1.0, 2.0), Seq(3.0)))))
    assert(e.getMessage.contains("1-dimensional") &&
      e.getMessage.contains("dimension is 2"), e.getMessage)
  }

  test("an EMPTY centroid set is refused at index build, and the expressions fail-fast too") {
    val e = intercept[IllegalArgumentException](
      Similarity.indexOf(spark, (Seq.empty[Long], Seq.empty[Seq[Double]])))
    assert(e.getMessage.contains("zero centroids"), e.getMessage)
    // defense-in-depth: a hand-built empty broadcast must produce the
    // descriptive error, not a bare ArrayIndexOutOfBounds on ids(0)
    val bc = spark.sparkContext.broadcast(
      FlatCentroids(0, Array.empty[Double], Array.empty[Long]))
    val df = spark.range(1).select(
      array(lit(1.0), lit(0.5)).cast("array<double>").as("vec"))
    val err = intercept[Exception] {
      import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
      df.select(toCol(graft.functions.expressions.NearestCentroidId(
        toExpr(col("vec")), bc))).collect()
    }
    def chain(t: Throwable): Seq[String] =
      if (t == null) Nil else t.getMessage +: chain(t.getCause)
    assert(chain(err).exists(m => m != null && m.contains("EMPTY centroid index")),
      chain(err).mkString(" | "))
    bc.destroy()
  }

  test("the iters=0 dim probe skips NULL vectors (a NULL row must not bypass the elements guard)") {
    // corpus: one NULL-vec row + dim-200 rows; 131072 cells × 200 dims
    // exceeds MaxFitElements, and the guard must fire even if the
    // probe's first-seen row is the NULL one
    val df = spark.range(10).select(col("id"),
      when(col("id") === 0, lit(null))
        .otherwise(transform(sequence(lit(0), lit(199)),
          i => (col("id") + i).cast("double"))).as("vec")
    ).coalesce(1).orderBy(col("id"))
    val e = intercept[IllegalArgumentException](
      Similarity.fitCentroids(df, "id", "vec", nCells = 131072))
    assert(e.getMessage.contains("fitCentroids"), e.getMessage)
  }

  // ── r18: the kernels generate code (VERDICT r17 item 3) ──

  test("centroid kernels run INSIDE whole-stage codegen and match interpreted eval") {
    import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
    import graft.functions.expressions.{NearestCentroidId, NearestInPacked}
    val superVecs: Seq[Seq[Double]] =
      Seq(Seq(1.0, 0.0, 0.0), Seq(0.0, 1.0, 0.0))
    val subVecs: Seq[Seq[Seq[Double]]] = Seq(
      Seq(Seq(1.0, 0.2, 0.0), Seq(1.0, -0.2, 0.0)),
      Seq(Seq(0.1, 1.0, 0.0))) // ragged sub-cells
    val counts = subVecs.map(_.size).toArray
    val offsets = counts.scanLeft(0)(_ + _).dropRight(1)
    val twoBc = spark.sparkContext.broadcast(TwoLevelFlatIndex(
      3, 2L, superVecs.flatten.toArray, superVecs.size,
      subVecs.flatten.flatten.toArray, offsets, counts))
    val bc = spark.sparkContext.broadcast(flat(cells))
    // the packed column rides the row (join-shaped), incl. the tie pair
    // and the zero-norm cell; vecs cover NULL input and zero-norm input.
    // Joining on spark.range keeps a real scan under the projection —
    // a bare LocalRelation would be constant-folded at optimize time
    // and no code would be generated at all.
    def q(asFloat: Boolean) = spark.range(6).toDF("id")
      .join(vecsDf(asFloat), Seq("id"), "inner")
      .select(col("id"),
      toCol(NearestCentroid(toExpr(col("vec")), bc)).as("a"),
      toCol(NearestCentroidId(toExpr(col("vec")), bc)).as("b"),
      toCol(TwoLevelNearestCell(toExpr(col("vec")), twoBc)).as("c"),
      toCol(NearestInPacked(toExpr(col("vec")),
        toExpr(typedlit(cells.flatten)), 3)).as("d"))
      .orderBy(col("id"))
    def rows(df: DataFrame): Seq[(Long, Int, Long, Long, Int)] =
      df.collect().toSeq.map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getInt(4)))
    val fallbackPrev = spark.conf.get("spark.sql.codegen.fallback")
    try {
      // fallback=false: a kernel whose generated code fails to compile
      // aborts the query instead of silently running interpreted
      spark.conf.set("spark.sql.codegen.fallback", "false")
      for (asFloat <- Seq(false, true)) {
        val out = q(asFloat)
        val cg = rows(out) // execute FIRST: AQE only inserts
        // WholeStageCodegen into the final per-stage plans
        val planStr = out.queryExecution.executedPlan.toString
        // first match is in the Final Plan section (printed before the
        // Initial Plan); '*(n)' marks operators fused into
        // WholeStageCodegen — the CodegenFallback form left this
        // Project un-starred
        val line = planStr.linesIterator
          .find(_.contains("nearest_in_packed")).getOrElse("")
        assert(line.contains("*("),
          s"kernel project not inside WholeStageCodegen:\n$planStr")
        // fully interpreted baseline: WSCG off AND the expression
        // factory pinned to interpreted projections (plain wholeStage
        // off still code-generates the projection kernels)
        spark.conf.set("spark.sql.codegen.wholeStage", "false")
        spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
        val interp = try rows(q(asFloat))
        finally {
          spark.conf.set("spark.sql.codegen.wholeStage", "true")
          spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
        }
        assert(cg == interp, s"codegen/interpreted divergence ($asFloat)")
        // pinned semantics spot checks: tie -> lower index, NULL vec -> 0
        assert(cg(1)._2 == 1 && cg(3)._2 == 0 && cg(3)._5 == 0)
      }
    } finally {
      spark.conf.set("spark.sql.codegen.fallback", fallbackPrev)
      twoBc.destroy(); bc.destroy()
    }
  }
}
