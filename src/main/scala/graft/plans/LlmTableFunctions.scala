package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.GraftColumnBridge.toCol
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.functions.col

import graft.operators.{Dedup, Similarity}

/** SQL faces for the LLM-pipeline operators — TABLE-VALUED FUNCTIONS
  * (`SELECT * FROM graft_semantic_dedup('emb', 'id', 'vec', 8, 2,
  * 0.35)`), registered through `SparkSessionExtensions
  * .injectTableFunction` so the result is a LOGICAL PLAN the outer
  * query composes with (joins, filters, CTAS) — never a driver-side
  * collect. This is the relation-producing complement to the
  * maintenance CALL procedures ([[GraftProcedures]]), whose LocalScan
  * row results are right for metadata work but wrong for operators
  * whose output is corpus-sized.
  *
  * The reference has no comparable surface (its binder is a closed
  * scalar-function enum, `src/planner/binder.rs:1504+`); these follow
  * Trino's polymorphic-table-function idiom instead. Table arguments
  * are names resolved through `SparkSession.active.table` — temp
  * views, catalog tables, and graft 3-part names all work. Fit-backed
  * operators (semantic dedup) run their bounded fit at PLAN time, the
  * same fit-then-broadcast shape the library API uses; the returned
  * relation itself stays fully distributed and lazy.
  */
object LlmTableFunctions {

  private def table(name: String): DataFrame = SparkSession.active.table(name)

  /** Evaluate a foldable argument (SQL literal or constant expression)
    * to a Scala value, with a usage-carrying error otherwise. */
  private def const(e: Expression, what: String, usage: String): Any = {
    require(e.foldable, s"$what must be a constant — usage: $usage")
    val v = e.eval()
    require(v != null, s"$what must not be NULL — usage: $usage")
    v
  }
  private def str(e: Expression, what: String, usage: String): String =
    const(e, what, usage).toString
  private def int(e: Expression, what: String, usage: String): Int = {
    def exact(bd: BigDecimal): Int = {
      // integral-and-in-range only: iters=2.9 (or 2.9e9) must raise the
      // usage error, not silently truncate to 2 (or wrap)
      require(bd.isValidInt,
        s"$what must be an integer (got $bd) — usage: $usage")
      bd.toIntExact
    }
    const(e, what, usage) match {
      case n @ (_: java.lang.Byte | _: java.lang.Short | _: java.lang.Integer) =>
        n.asInstanceOf[java.lang.Number].intValue()
      case l: java.lang.Long => exact(BigDecimal(l))
      case f: java.lang.Float => exact(BigDecimal.decimal(f))
      case d: java.lang.Double => exact(BigDecimal(d))
      // unsuffixed SQL literals like 8 in a wider context / 0.35 parse
      // as DecimalType; Literal.eval yields Spark's Decimal, which is
      // NOT a java.lang.Number
      case d: org.apache.spark.sql.types.Decimal => exact(d.toBigDecimal)
      case v => sys.error(s"$what must be an integer (got $v) — usage: $usage")
    }
  }
  private def dbl(e: Expression, what: String, usage: String): Double =
    const(e, what, usage) match {
      case n: java.lang.Number => n.doubleValue()
      case d: org.apache.spark.sql.types.Decimal => d.toDouble
      case v => sys.error(s"$what must be numeric (got $v) — usage: $usage")
    }

  private def plan(df: DataFrame): LogicalPlan = df.queryExecution.logical

  // ─────────────────────────── fit cache ────────────────────────────
  // Fit-backed TVFs (semantic dedup, kmeans assign/fit, dedup
  // clusters) run their bounded fit / convergence ACTIONS at plan
  // time. Resolution is not execution: re-running the same SQL text,
  // EXPLAIN over it, or a view built on it re-resolves the TVF — and
  // without a cache each re-resolution refits from scratch (135 s at
  // the r14 20M-doc anchor). The cache is SESSION-scoped (WeakHashMap
  // on the SparkSession — dies with the session) and keyed on
  // (function, evaluated args, canonicalized analyzed PLANS of every
  // table argument) — the plans themselves, not their hashCodes, so a
  // hash collision degrades to structural equality, never to serving
  // a stale fit. A graft-catalog table pins its snapshot id at
  // analysis (GraftRelation), so a committed write changes the key and
  // the next call refits naturally; commits additionally EVICT
  // matching entries through [[invalidateFitsForPath]] (wired into
  // IcebergLite.commitSnapshot), so even a plan shape that does not
  // carry the snapshot cannot serve a stale fit. The remaining blind
  // spot is in-place mutation of a NON-graft source behind an
  // unchanged plan (files appended to a bare parquet dir): after such
  // a write, call [[clearFitCache]] (or re-create the view).
  private val MaxCachedFits = 64

  /** One memoized fit build: the lazy val synchronizes on THIS memo,
    * so a 135 s cold fit blocks only callers of the same key — cache
    * hits and unrelated builds in other sessions proceed (the session
    * map's lock is held only for the lookup, never the build). */
  private final class FitMemo(build: () => LogicalPlan) {
    lazy val plan: LogicalPlan = { fitBuilds.incrementAndGet(); build() }
  }
  private final class SessionFits {
    val fits = scala.collection.mutable.LinkedHashMap
      .empty[(String, Seq[Any], Seq[LogicalPlan]), FitMemo]
  }
  private val fitCache = new java.util.WeakHashMap[SparkSession, SessionFits]

  /** How many fits this JVM has actually BUILT (cache misses) — the
    * observable TvfSpec counts to prove a second resolution is free. */
  private[graft] val fitBuilds = new java.util.concurrent.atomic.AtomicLong

  /** Drop every cached fit for `spark` — call after mutating a table's
    * data in place behind an unchanged plan. */
  def clearFitCache(spark: SparkSession): Unit =
    fitCache.synchronized { fitCache.remove(spark) }

  /** Evict every cached fit (in every live session) whose table-argument
    * plans read `tablePath` — called by IcebergLite's commit funnel so a
    * write to a fitted table can never serve a stale fit, even when the
    * resolved plan shape would not change. Leaf detection covers both
    * the lazy catalog relation (GraftRelation, path carried verbatim)
    * and the eager file-scan fallback (LogicalRelation whose root paths
    * live under the table dir). Root paths match on a PATH BOUNDARY
    * (equality or a `tablePath + "/"` prefix), both sides normalized
    * through `Path.toUri.getPath` — a raw-string prefix would make a
    * commit to `…/t1` evict fits over a sibling `…/t10` (spurious
    * refits) and a `file:///x` rendering vs `/x` would silently MISS
    * the eviction (staleness — the dangerous direction). */
  private[graft] def invalidateFitsForPath(tablePath: String): Unit = {
    def norm(p: String): String = {
      val u = new org.apache.hadoop.fs.Path(p).toUri.getPath
      if (u == null || u.isEmpty) p else u
    }
    val table = norm(tablePath)
    def underTable(p: String): Boolean = {
      val n = norm(p)
      n == table || n.startsWith(table + "/")
    }
    def readsPath(p: LogicalPlan): Boolean = p.collectLeaves().exists {
      case g: GraftRelation => norm(g.tablePath) == table
      case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        l.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.exists(r => underTable(r.toString))
          case _ => false
        }
      case _ => false
    }
    fitCache.synchronized {
      fitCache.values.forEach { sf =>
        sf.synchronized {
          sf.fits.filterInPlace { case ((_, _, plans), _) =>
            !plans.exists(readsPath)
          }
        }
      }
    }
  }

  private def cached(fn: String, argv: Seq[Any], tables: Seq[String])(
      build: => LogicalPlan): LogicalPlan = {
    val spark = SparkSession.active
    val plans = tables.map(t =>
      spark.table(t).queryExecution.analyzed.canonicalized)
    val key = (fn, argv, plans)
    val sf = fitCache.synchronized {
      var s = fitCache.get(spark)
      if (s == null) { s = new SessionFits; fitCache.put(spark, s) }
      s
    }
    val memo = sf.synchronized {
      sf.fits.getOrElseUpdate(key, {
        if (sf.fits.size >= MaxCachedFits) sf.fits.remove(sf.fits.head._1) // FIFO bound
        new FitMemo(() => build)
      })
    }
    memo.plan // forced OUTSIDE the map locks — builds serialize per key only
  }

  private val dedupExactUsage =
    "graft_dedup_exact(table_name, 'key_sql_expr', 'id_sql_expr')"

  /** Exact dedup: groups by a digest of the key expression, keeps
    * min(id) per group. The key/id are SQL expression STRINGS parsed at
    * plan time (the analyzer resolves TVF arguments before the builder
    * runs, so a bare column reference can't ride through as an
    * expression argument — same reason Trino's PTFs take descriptor
    * strings). Returns (dup_key, keep_id, group_size). */
  private[plans] def dedupExact(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 3, s"usage: $dedupExactUsage")
    val df = table(str(args(0), "table_name", dedupExactUsage))
    val parser = SparkSession.active.sessionState.sqlParser
    plan(Dedup.exact(df,
      toCol(parser.parseExpression(str(args(1), "key_sql_expr", dedupExactUsage))),
      toCol(parser.parseExpression(str(args(2), "id_sql_expr", dedupExactUsage)))))
  }

  private val semanticDedupUsage =
    "graft_semantic_dedup(table_name, id_col, vec_col, n_cells, iters, threshold)"

  /** SemDeDup semantic dedup (see [[Similarity.semanticDedup]]): the
    * k-means fit runs at plan time (bounded, [[Similarity.MaxFitCells]]
    * / MaxFitElements guarded); the returned relation is the lazy
    * cell-confined pair scan. Returns (id, cell_id, dup_of). */
  private[plans] def semanticDedup(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6, s"usage: $semanticDedupUsage")
    def s(i: Int, w: String) = str(args(i), w, semanticDedupUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val nCells = int(args(3), "n_cells", semanticDedupUsage)
    val iters = int(args(4), "iters", semanticDedupUsage)
    val threshold = dbl(args(5), "threshold", semanticDedupUsage)
    cached("graft_semantic_dedup", Seq(tbl, id, vec, nCells, iters, threshold),
        Seq(tbl)) {
      plan(Similarity.semanticDedup(table(tbl), id, vec,
        nCells = nCells, iters = iters, threshold = threshold))
    }
  }

  private def parseCol(e: Expression, what: String, usage: String) =
    toCol(SparkSession.active.sessionState.sqlParser
      .parseExpression(str(e, what, usage)))

  private val semanticDedup2Usage =
    "graft_semantic_dedup2(table_name, id_col, vec_col, n_super, " +
      "n_sub_per_cell, iters, threshold[, lsh_union[, lsh_bands]])"

  /** Two-level (IMI-style) SemDeDup (see
    * [[Similarity.semanticDedupTwoLevel]]): same contract as
    * graft_semantic_dedup but assignment is O(√cells) per row — the
    * SQL face of the scale path. The fit runs at plan time (bounded
    * collects); the relation is the lazy cell-confined pair scan. */
  private def bool(e: Expression, what: String, usage: String): Boolean =
    const(e, what, usage) match {
      case b: java.lang.Boolean => b.booleanValue()
      case v => sys.error(s"$what must be a boolean (got $v) — usage: $usage")
    }

  private[plans] def semanticDedup2(args: Seq[Expression]): LogicalPlan = {
    // optional trailing lsh_union (default false) = the recall-recovery
    // dial for fine grids ([[Similarity.semanticDedupTwoLevel]]);
    // optional lsh_bands after it (default 0 = AUTO —
    // [[Similarity.autoLshBands]] sizes the band width from the
    // corpus's own signature sample at plan time; the static 16×4
    // banding the pre-r17 default hard-coded is 6 orders of magnitude
    // over the candidate budget at 20M docs, exactly the footgun the
    // auto-sizer exists to remove — small corpora still land on 16×4
    // through the budget floor, so results there are unchanged)
    require(args.length >= 7 && args.length <= 9,
      s"usage: $semanticDedup2Usage")
    def s(i: Int, w: String) = str(args(i), w, semanticDedup2Usage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val nSuper = int(args(3), "n_super", semanticDedup2Usage)
    val nSub = int(args(4), "n_sub_per_cell", semanticDedup2Usage)
    val iters = int(args(5), "iters", semanticDedup2Usage)
    val threshold = dbl(args(6), "threshold", semanticDedup2Usage)
    val union =
      args.length >= 8 && bool(args(7), "lsh_union", semanticDedup2Usage)
    val bands =
      if (args.length == 9) int(args(8), "lsh_bands", semanticDedup2Usage)
      else 0
    cached("graft_semantic_dedup2",
        Seq(tbl, id, vec, nSuper, nSub, iters, threshold, union, bands),
        Seq(tbl)) {
      // past the broadcast ceiling the SAME call routes through the
      // relation-indexed path (bit-identical fit + assignment — see
      // RelIndexSpec), so a cells budget that used to be refused now
      // just runs: cells ∝ corpus with no index through the driver
      if (nSuper.toLong * nSub > Similarity.MaxFitCells)
        plan(Similarity.semanticDedupTwoLevelRel(table(tbl), id, vec,
          threshold,
          Similarity.kmeansTwoLevelRel(table(tbl), id, vec, nSuper, nSub,
            iters),
          lshUnion = union, lshBands = bands))
      else
        plan(Similarity.semanticDedupTwoLevel(table(tbl), id, vec,
          nSuper = nSuper, nSubPerCell = nSub, iters = iters,
          threshold = threshold, lshUnion = union, lshBands = bands))
    }
  }

  private val kmeansAssignUsage =
    "graft_kmeans_assign(table_name, id_col, vec_col, n_cells, iters)"

  /** Lloyd-refined k-means assignment (see [[Similarity.kmeansAssign]]):
    * the clustering primitive under IVF/SemDeDup as a SQL relation —
    * (id, vec, cell_id), the assignment a pure zero-shuffle projection
    * against the broadcast index fitted at plan time. */
  private[plans] def kmeansAssign(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $kmeansAssignUsage")
    def s(i: Int, w: String) = str(args(i), w, kmeansAssignUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val nCells = int(args(3), "n_cells", kmeansAssignUsage)
    val iters = int(args(4), "iters", kmeansAssignUsage)
    cached("graft_kmeans_assign", Seq(tbl, id, vec, nCells, iters), Seq(tbl)) {
      plan(Similarity.kmeansAssign(table(tbl), id, vec,
        nCells = nCells, iters = iters))
    }
  }

  private val kmeansFitUsage =
    "graft_kmeans_fit(table_name, id_col, vec_col, n_cells, iters)"

  /** The FIT alone, materialized as a relation `(cell_id BIGINT,
    * centroid ARRAY<DOUBLE>)` — the fit-once-serve-many seam in SQL:
    * CTAS / CACHE TABLE the result once, then feed it to
    * [[kmeansAssignWith]] / [[semanticDedupWith]] for any number of
    * batches; no downstream call ever refits. The same Lloyd fit as
    * `graft_kmeans_assign` ([[Similarity.kmeansCentroids]]: lowest-id
    * seeds, 1e-9-quantized means, reproducible at any parallelism). */
  private[plans] def kmeansFit(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $kmeansFitUsage")
    def s(i: Int, w: String) = str(args(i), w, kmeansFitUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val nCells = int(args(3), "n_cells", kmeansFitUsage)
    val iters = int(args(4), "iters", kmeansFitUsage)
    cached("graft_kmeans_fit", Seq(tbl, id, vec, nCells, iters), Seq(tbl)) {
      val (ids, vecs) =
        Similarity.kmeansCentroids(table(tbl), id, vec, nCells, iters)
      val spark = SparkSession.active
      import spark.implicits._
      plan(ids.zip(vecs).toDF("cell_id", "centroid"))
    }
  }

  /** Collect a centroids relation (the [[kmeansFit]] contract:
    * cell_id + centroid columns) back into the bounded driver-side
    * form the assignment broadcast needs. Ordered by cell_id so the
    * argmax tie-break (lowest INDEX) is a function of the centroid
    * SET, not of the table's row order — and so a fit round-tripped
    * through [[kmeansFit]] (which emits in index order = ascending
    * seed id) reproduces the original assignment exactly. */
  private def collectCentroids(name: String, usage: String)
      : (Seq[Long], Seq[Seq[Double]]) = {
    val df = table(name)
    require(df.columns.contains("cell_id") && df.columns.contains("centroid"),
      s"centroids_table '$name' must have cell_id and centroid columns " +
        s"(the graft_kmeans_fit contract) — usage: $usage")
    val rows = df
      .select(col("cell_id").cast("long"), col("centroid").cast("array<double>"))
      .orderBy(col("cell_id")).limit(Similarity.MaxFitCells + 1).collect()
    require(rows.length <= Similarity.MaxFitCells,
      s"centroids_table '$name' exceeds MaxFitCells = " +
        s"${Similarity.MaxFitCells} — usage: $usage")
    require(rows.nonEmpty,
      s"centroids_table '$name' is empty — usage: $usage")
    // duplicate cell_ids would make the orderBy tie-order — hence the
    // argmax tie-break index order — nondeterministic across runs
    val ids = rows.map(_.getLong(0)).toSeq
    require(ids.distinct.size == ids.size,
      s"centroids_table '$name' has duplicate cell_id rows " +
        s"(${ids.diff(ids.distinct).distinct.take(5).mkString(", ")}) — " +
        s"usage: $usage")
    (ids, rows.map(_.getSeq[Double](1)).toSeq)
  }

  private val kmeansAssignWithUsage =
    "graft_kmeans_assign_with(table_name, id_col, vec_col, centroids_table)"

  /** Assignment against a PREFITTED centroids relation (from
    * [[kmeansFit]], materialized or any relation honoring its schema):
    * collects the bounded centroid set (≤ MaxFitCells rows — never the
    * corpus), broadcasts it once, and returns the zero-shuffle argmax
    * projection. No fit runs — ever. */
  private[plans] def kmeansAssignWith(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, s"usage: $kmeansAssignWithUsage")
    def s(i: Int, w: String) = str(args(i), w, kmeansAssignWithUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val centTbl = s(3, "centroids_table")
    cached("graft_kmeans_assign_with", Seq(tbl, id, vec, centTbl),
        Seq(tbl, centTbl)) {
      plan(Similarity.kmeansAssign(table(tbl), id, vec,
        Similarity.indexOf(SparkSession.active,
          collectCentroids(centTbl, kmeansAssignWithUsage))))
    }
  }

  private val semanticDedupWithUsage =
    "graft_semantic_dedup_with(table_name, id_col, vec_col, " +
      "centroids_table, threshold)"

  /** [[semanticDedup]] against a prefitted centroids relation — same
    * contract (id, cell_id, dup_of), zero fit jobs. */
  private[plans] def semanticDedupWith(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $semanticDedupWithUsage")
    def s(i: Int, w: String) = str(args(i), w, semanticDedupWithUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val centTbl = s(3, "centroids_table")
    val threshold = dbl(args(4), "threshold", semanticDedupWithUsage)
    cached("graft_semantic_dedup_with", Seq(tbl, id, vec, centTbl, threshold),
        Seq(tbl, centTbl)) {
      plan(Similarity.semanticDedup(table(tbl), id, vec, threshold,
        Similarity.indexOf(SparkSession.active,
          collectCentroids(centTbl, semanticDedupWithUsage))))
    }
  }

  private val kmeansFit2Usage =
    "graft_kmeans_fit2(table_name, id_col, vec_col, n_super, " +
      "n_sub_per_cell, iters)"

  /** The TWO-LEVEL fit materialized as a relation — the scale path's
    * fit-once-serve-many seam (`(super_id INT, sub_id INT, centroid
    * ARRAY<DOUBLE>)`; `sub_id = -1` rows carry the super centroids,
    * `sub_id >= 0` rows super cell `super_id`'s sub-centroids in fit
    * order). CTAS/cache once, then serve [[kmeansAssign2With]] /
    * [[semanticDedup2With]] batches without ever refitting. */
  private[plans] def kmeansFit2(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 6, s"usage: $kmeansFit2Usage")
    def s(i: Int, w: String) = str(args(i), w, kmeansFit2Usage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val nSuper = int(args(3), "n_super", kmeansFit2Usage)
    val nSub = int(args(4), "n_sub_per_cell", kmeansFit2Usage)
    val iters = int(args(5), "iters", kmeansFit2Usage)
    cached("graft_kmeans_fit2", Seq(tbl, id, vec, nSuper, nSub, iters),
        Seq(tbl)) {
      // past the broadcast ceiling, fit distributed (bit-identical —
      // RelIndexSpec) and return the relation directly
      if (nSuper.toLong * nSub > Similarity.MaxFitCells)
        plan(Similarity.kmeansTwoLevelRel(table(tbl), id, vec, nSuper,
          nSub, iters))
      else {
        val (supers, subs) =
          Similarity.kmeansTwoLevel(table(tbl), id, vec, nSuper, nSub, iters)
        val rows = supers.zipWithIndex.map { case (v, sIdx) => (sIdx, -1, v) } ++
          subs.zipWithIndex.flatMap { case (cells, sIdx) =>
            cells.zipWithIndex.map { case (v, b) => (sIdx, b, v) }
          }
        val spark = SparkSession.active
        import spark.implicits._
        plan(rows.toDF("super_id", "sub_id", "centroid"))
      }
    }
  }

  /** Does the fit2-contract index relation exceed [[collectTwoLevel]]'s
    * driver cap? One bounded probe job (scans at most cap+1 rows, moves
    * one long) — the `_with` TVFs use it to route oversized indexes to
    * the relation-join assignment instead of refusing them. */
  private def indexOverCap(name: String): Boolean = {
    val cap = 2 * Similarity.MaxFitCells
    table(name).limit(cap + 1).count() > cap
  }

  /** Reconstruct a two-level index from a [[kmeansFit2]]-shaped
    * relation (bounded collect — index rows, never the corpus). The
    * rebuilt index reproduces the original composite cell ids exactly:
    * sub order within a super cell is `sub_id` order (the fit order
    * the stride keys on). */
  private def collectTwoLevel(name: String, usage: String)
      : (Seq[Seq[Double]], Seq[Seq[Seq[Double]]]) = {
    val df = table(name)
    require(Seq("super_id", "sub_id", "centroid").forall(df.columns.contains),
      s"index_table '$name' must have super_id, sub_id and centroid " +
        s"columns (the graft_kmeans_fit2 contract) — usage: $usage")
    val cap = 2 * Similarity.MaxFitCells
    val rows = df
      .select(col("super_id").cast("int"), col("sub_id").cast("int"),
        col("centroid").cast("array<double>"))
      .orderBy(col("super_id"), col("sub_id")).limit(cap + 1).collect()
    require(rows.length <= cap,
      s"index_table '$name' exceeds ${cap} rows — usage: $usage")
    require(rows.nonEmpty, s"index_table '$name' is empty — usage: $usage")
    val bySuper = rows.groupBy(_.getInt(0))
    val nSuper = bySuper.keys.max + 1
    require(bySuper.keys.min == 0 && bySuper.size == nSuper,
      s"index_table '$name' super_id values must be contiguous " +
        s"0..${nSuper - 1} — usage: $usage")
    val supers = (0 until nSuper).map { sIdx =>
      val sup = bySuper(sIdx).filter(_.getInt(1) == -1)
      require(sup.length == 1,
        s"index_table '$name' super cell $sIdx needs exactly one " +
          s"sub_id = -1 (super centroid) row, found ${sup.length} — " +
          s"usage: $usage")
      sup.head.getSeq[Double](2).toSeq
    }
    val subs = (0 until nSuper).map { sIdx =>
      val subRows = bySuper(sIdx).filter(_.getInt(1) >= 0).sortBy(_.getInt(1))
      // duplicate sub_ids would silently shift the composite
      // super*stride+sub cell ids away from the fit contract
      val subIds = subRows.map(_.getInt(1)).toSeq
      require(subIds.distinct.size == subIds.size,
        s"index_table '$name' super cell $sIdx has duplicate sub_id rows " +
          s"(${subIds.diff(subIds.distinct).distinct.take(5).mkString(", ")}) " +
          s"— usage: $usage")
      val cells = subRows.map(_.getSeq[Double](2).toSeq).toSeq
      require(cells.nonEmpty,
        s"index_table '$name' super cell $sIdx has no sub-centroids — " +
          s"usage: $usage")
      cells
    }
    (supers, subs)
  }

  private val kmeansAssign2WithUsage =
    "graft_kmeans_assign2_with(table_name, id_col, vec_col, index_table)"

  /** Two-level assignment against a PREFITTED [[kmeansFit2]] relation:
    * one broadcast, zero fit jobs, zero shuffles of the corpus —
    * returns (id, vec, cell_id) with the composite super·stride+sub
    * cell id. */
  private[plans] def kmeansAssign2With(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 4, s"usage: $kmeansAssign2WithUsage")
    def s(i: Int, w: String) = str(args(i), w, kmeansAssign2WithUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val idxTbl = s(3, "index_table")
    cached("graft_kmeans_assign2_with", Seq(tbl, id, vec, idxTbl),
        Seq(tbl, idxTbl)) {
      // an index too large for the driver routes through the
      // relation-join assignment (bit-identical — RelIndexSpec)
      if (indexOverCap(idxTbl))
        plan(Similarity.twoLevelAssignRel(table(tbl), id, vec,
          table(idxTbl)))
      else
        plan(Similarity.twoLevelAssign(table(tbl), id, vec,
          Similarity.twoLevelIndexOf(SparkSession.active,
            collectTwoLevel(idxTbl, kmeansAssign2WithUsage))))
    }
  }

  private val semanticDedup2WithUsage =
    "graft_semantic_dedup2_with(table_name, id_col, vec_col, " +
      "index_table, threshold[, lsh_union[, lsh_bands]])"

  /** Two-level SemDeDup against a prefitted [[kmeansFit2]] relation —
    * same contract as graft_semantic_dedup2, zero fit jobs; optional
    * trailing lsh_union enables the recall-recovery union, and
    * lsh_bands sizes its banding (default 0 = auto, see
    * [[semanticDedup2]] — one bounded sample pass at plan time). */
  private[plans] def semanticDedup2With(args: Seq[Expression]): LogicalPlan = {
    require(args.length >= 5 && args.length <= 7,
      s"usage: $semanticDedup2WithUsage")
    def s(i: Int, w: String) = str(args(i), w, semanticDedup2WithUsage)
    val (tbl, id, vec) = (s(0, "table_name"), s(1, "id_col"), s(2, "vec_col"))
    val idxTbl = s(3, "index_table")
    val threshold = dbl(args(4), "threshold", semanticDedup2WithUsage)
    val union =
      args.length >= 6 && bool(args(5), "lsh_union", semanticDedup2WithUsage)
    val bands =
      if (args.length == 7) int(args(6), "lsh_bands", semanticDedup2WithUsage)
      else 0
    cached("graft_semantic_dedup2_with",
        Seq(tbl, id, vec, idxTbl, threshold, union, bands), Seq(tbl, idxTbl)) {
      if (indexOverCap(idxTbl))
        plan(Similarity.semanticDedupTwoLevelRel(table(tbl), id, vec,
          threshold, table(idxTbl), lshUnion = union, lshBands = bands))
      else
        plan(Similarity.semanticDedupTwoLevel(table(tbl), id, vec, threshold,
          Similarity.twoLevelIndexOf(SparkSession.active,
            collectTwoLevel(idxTbl, semanticDedup2WithUsage)), union,
          64, bands, 42L))
    }
  }

  private val minhashPairsUsage =
    "graft_minhash_pairs(table_name, 'id_sql_expr', 'text_sql_expr', " +
      "n, bands, rows_per_band, threshold)"

  /** MinHash+LSH near-dup pairs (see [[Dedup.minhashLshPairs]]):
    * banding generates candidates, exact Jaccard verifies. Returns
    * (a_id, b_id, jaccard) — the same distributed
    * shingle→signature→band→bucket-join plan as the library API. */
  private[plans] def minhashPairs(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 7, s"usage: $minhashPairsUsage")
    def c(i: Int, w: String) = parseCol(args(i), w, minhashPairsUsage)
    plan(Dedup.minhashLshPairs(
      table(str(args(0), "table_name", minhashPairsUsage)),
      c(1, "id_sql_expr"), c(2, "text_sql_expr"),
      n = int(args(3), "n", minhashPairsUsage),
      bands = int(args(4), "bands", minhashPairsUsage),
      rowsPerBand = int(args(5), "rows_per_band", minhashPairsUsage),
      threshold = dbl(args(6), "threshold", minhashPairsUsage)))
  }

  private val simhashPairsUsage =
    "graft_simhash_pairs(table_name, 'id_sql_expr', 'text_sql_expr', " +
      "max_hamming, chunks)"

  /** SimHash near-dup pairs (see [[Dedup.simhashPairs]]): pigeonhole
    * banding over the 64-bit fingerprint — exact recall for
    * max_hamming < chunks. Returns (a_id, b_id, hamming). */
  private[plans] def simhashPairs(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $simhashPairsUsage")
    def c(i: Int, w: String) = parseCol(args(i), w, simhashPairsUsage)
    plan(Dedup.simhashPairs(
      table(str(args(0), "table_name", simhashPairsUsage)),
      c(1, "id_sql_expr"), c(2, "text_sql_expr"),
      maxHamming = int(args(3), "max_hamming", simhashPairsUsage),
      chunks = int(args(4), "chunks", simhashPairsUsage)))
  }

  private val dedupClustersUsage =
    "graft_dedup_clusters(table_name, 'id_sql_expr', 'text_sql_expr', " +
      "n, threshold)"

  /** Near-dup CLUSTERS (see [[Dedup.clusters]]): exact n-gram Jaccard
    * pairs → connected components → (doc_id, cluster_id, cluster_size,
    * is_canonical). NOTE: the component iteration runs its per-round
    * convergence actions at PLAN time (like the semantic-dedup fit);
    * the returned relation is the final label join, fully distributed. */
  private[plans] def dedupClusters(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $dedupClustersUsage")
    def c(i: Int, w: String) = parseCol(args(i), w, dedupClustersUsage)
    val tbl = str(args(0), "table_name", dedupClustersUsage)
    val idSql = str(args(1), "id_sql_expr", dedupClustersUsage)
    val textSql = str(args(2), "text_sql_expr", dedupClustersUsage)
    val n = int(args(3), "n", dedupClustersUsage)
    val threshold = dbl(args(4), "threshold", dedupClustersUsage)
    cached("graft_dedup_clusters", Seq(tbl, idSql, textSql, n, threshold),
        Seq(tbl)) {
      plan(Dedup.clusters(table(tbl),
        c(1, "id_sql_expr"), c(2, "text_sql_expr"),
        n = n, threshold = threshold))
    }
  }

  private val annTopkUsage =
    "graft_ann_topk(corpus_table, query_table, id_col, vec_col, k)"

  /** Exact brute-force cosine top-k of each query-table row against the
    * corpus table (both named relations sharing `id_col`/`vec_col`
    * layout; make the query side a temp view over any SELECT). The
    * query side broadcasts — corpus never shuffles. Returns
    * (query_id, rank, neighbor_id, cos_sim). */
  private[plans] def annTopk(args: Seq[Expression]): LogicalPlan = {
    require(args.length == 5, s"usage: $annTopkUsage")
    def s(i: Int, w: String) = str(args(i), w, annTopkUsage)
    val (idCol, vecCol) = (s(2, "id_col"), s(3, "vec_col"))
    val corpus = table(s(0, "corpus_table")).select(col(idCol), col(vecCol))
    val queries = table(s(1, "query_table"))
      .select(col(idCol).as("__q_id"), col(vecCol).as("__q_vec"))
    plan(Similarity.bruteForceTopK(corpus, queries, idCol, vecCol,
      "__q_id", "__q_vec", k = int(args(4), "k", annTopkUsage)))
  }

  def register(e: SparkSessionExtensions): Unit = {
    def info(name: String, usage: String) = new ExpressionInfo(
      LlmTableFunctions.getClass.getCanonicalName, null, name, usage,
      "", "", "", "table_funcs", "4.0.0", "", "internal")
    e.injectTableFunction((FunctionIdentifier("graft_dedup_exact"),
      info("graft_dedup_exact", dedupExactUsage), dedupExact _))
    e.injectTableFunction((FunctionIdentifier("graft_semantic_dedup"),
      info("graft_semantic_dedup", semanticDedupUsage), semanticDedup _))
    e.injectTableFunction((FunctionIdentifier("graft_ann_topk"),
      info("graft_ann_topk", annTopkUsage), annTopk _))
    e.injectTableFunction((FunctionIdentifier("graft_minhash_pairs"),
      info("graft_minhash_pairs", minhashPairsUsage), minhashPairs _))
    e.injectTableFunction((FunctionIdentifier("graft_simhash_pairs"),
      info("graft_simhash_pairs", simhashPairsUsage), simhashPairs _))
    e.injectTableFunction((FunctionIdentifier("graft_dedup_clusters"),
      info("graft_dedup_clusters", dedupClustersUsage), dedupClusters _))
    e.injectTableFunction((FunctionIdentifier("graft_semantic_dedup2"),
      info("graft_semantic_dedup2", semanticDedup2Usage), semanticDedup2 _))
    e.injectTableFunction((FunctionIdentifier("graft_kmeans_assign"),
      info("graft_kmeans_assign", kmeansAssignUsage), kmeansAssign _))
    e.injectTableFunction((FunctionIdentifier("graft_kmeans_fit"),
      info("graft_kmeans_fit", kmeansFitUsage), kmeansFit _))
    e.injectTableFunction((FunctionIdentifier("graft_kmeans_assign_with"),
      info("graft_kmeans_assign_with", kmeansAssignWithUsage), kmeansAssignWith _))
    e.injectTableFunction((FunctionIdentifier("graft_semantic_dedup_with"),
      info("graft_semantic_dedup_with", semanticDedupWithUsage), semanticDedupWith _))
    e.injectTableFunction((FunctionIdentifier("graft_kmeans_fit2"),
      info("graft_kmeans_fit2", kmeansFit2Usage), kmeansFit2 _))
    e.injectTableFunction((FunctionIdentifier("graft_kmeans_assign2_with"),
      info("graft_kmeans_assign2_with", kmeansAssign2WithUsage), kmeansAssign2With _))
    e.injectTableFunction((FunctionIdentifier("graft_semantic_dedup2_with"),
      info("graft_semantic_dedup2_with", semanticDedup2WithUsage), semanticDedup2With _))
  }
}
