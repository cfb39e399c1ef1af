package graft.functions.expressions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Broadcast-backed centroid indexes for the k-means / IVF / SemDeDup
  * assignment paths.
  *
  * WHY NOT A PLAN LITERAL: embedding the centroid matrix as a
  * `typedlit(Seq[Seq[Double]])` puts it in every task binary — at the
  * SemDeDup discipline's real index size (50k cells × 32+ dims) that is
  * a ~22 MiB serialized closure which EVERY concurrent task
  * deserializes into boxed nested arrays (~40 bytes per element), and a
  * self-join stage carries it once per join side: 32 local tasks × 2
  * sides OOMed an 8 GiB heap at 20M docs (r14 measured). A
  * `Broadcast` deserializes ONCE per executor JVM into flat primitive
  * `Array[Double]` (8 bytes per element) shared by all its tasks — the
  * same torrent mechanism a 1000-executor cluster uses for map-side
  * join sides. The argmax itself becomes one fused primitive loop per
  * row instead of per-cell struct allocations.
  *
  * SEMANTICS ARE PINNED to the plan-literal form they replace
  * (`array_max` over `struct(cosine_similarity(vec, c), -i-1)`):
  *   - cosine = dot/(‖x‖·‖y‖) accumulated in ascending element order
  *     (bit-identical to [[CosineSimilarity.nullSafeEval]]);
  *   - zero-norm side → that cell's sim is NULL, and NULL loses to any
  *     non-NULL sim (Spark struct ordering);
  *   - ties (including all-NULL and a NULL input vector) resolve to the
  *     LOWEST cell index; NaN compares greatest; -0.0 == 0.0
  *     (SQLOrderingUtil double semantics).
  */
final case class FlatCentroids(dim: Int, flat: Array[Double],
    ids: Array[Long]) {
  def n: Int = if (dim == 0) 0 else flat.length / dim
  require(ids.length == n,
    s"ids (${ids.length}) must match centroid count ($n)")
  /** Fail-fast for the degenerate index the NULL-input fallbacks can't
    * serve: `ids(0)` / argmax's `best=0` on an EMPTY centroid set would
    * surface as a bare ArrayIndexOutOfBounds deep in a task. The
    * library fits refuse to build an empty index ([[graft.operators
    * .Similarity]] broadcastFlat), so this only trips a caller handing
    * a hand-built empty index to a prefitted-index API. */
  def requireNonEmpty(what: String): Unit =
    require(n > 0, s"$what was given an EMPTY centroid index (0 " +
      "centroids): fit on a non-empty corpus, or pass a non-empty " +
      "prefitted centroid set")
}

/** Two-level (IMI-style) index flattened for broadcast: super-cell s's
  * sub-centroids are `subFlat` vectors `[subOffsets(s),
  * subOffsets(s)+subCounts(s))`; composite cell id = s·stride + sub. */
final case class TwoLevelFlatIndex(
    dim: Int,
    stride: Long,
    superFlat: Array[Double],
    nSuper: Int,
    subFlat: Array[Double],
    subOffsets: Array[Int],
    subCounts: Array[Int])

private[graft] object CentroidKernel {
  /** Argmax centroid index in `flat[(from+c)*dim ..)` for c in
    * [0, count) under the pinned ordering above; `vec` may not be null
    * (callers map a NULL input to index 0, the all-NULL-sims tie). */
  def argmax(vec: ArrayData, isFloat: Boolean, dim: Int,
      flat: Array[Double], from: Int, count: Int): Int = {
    val vLen = vec.numElements()
    val n = math.min(vLen, dim)
    var best = 0
    var bestSim = 0.0
    var bestValid = false
    var c = 0
    while (c < count) {
      val base = (from + c) * dim
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val yi = flat(base + i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx != 0.0 && ny != 0.0) {
        // + 0.0 normalizes -0.0 to 0.0 (Spark compares them equal)
        val sim = dot / (math.sqrt(nx) * math.sqrt(ny)) + 0.0
        val better =
          if (!bestValid) true
          else if (java.lang.Double.isNaN(sim)) !java.lang.Double.isNaN(bestSim)
          else if (java.lang.Double.isNaN(bestSim)) false
          else sim > bestSim
        if (better) { best = c; bestSim = sim; bestValid = true }
      }
      c += 1
    }
    best
  }

  def checkVecType(dt: DataType, what: String): TypeCheckResult = dt match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what expects array<float|double>, got $other")
  }

  // ── Whole-row eval bodies, shared verbatim by each expression's
  // interpreted eval AND its generated code (the object compiles to
  // static forwarders, so codegen calls them as plain static Java
  // methods — one body, bit-identical on both paths; r18, VERDICT r17
  // item 3: CodegenFallback on these kernels broke whole-stage codegen
  // for the corpus-scale assign stages and boxed every returned id). ──

  /** [[NearestCentroid]]'s body: NULL input → 0 (the all-NULL tie). */
  def nearestFlat(vec: ArrayData, isFloat: Boolean, idx: FlatCentroids,
      what: String): Int = {
    idx.requireNonEmpty(what)
    if (vec == null) 0
    else argmax(vec, isFloat, idx.dim, idx.flat, 0, idx.n)
  }

  /** [[NearestCentroidId]]'s body: NULL input → ids(0). */
  def nearestFlatId(vec: ArrayData, isFloat: Boolean, idx: FlatCentroids,
      what: String): Long = {
    idx.requireNonEmpty(what)
    if (vec == null) idx.ids(0)
    else idx.ids(argmax(vec, isFloat, idx.dim, idx.flat, 0, idx.n))
  }

  /** [[TwoLevelNearestCell]]'s body: NULL input → 0L (s=0, sub=0). */
  def twoLevelCell(vec: ArrayData, isFloat: Boolean,
      idx: TwoLevelFlatIndex, what: String): Long = {
    // same fail-fast as FlatCentroids.requireNonEmpty: an empty super
    // set would send argmax's best=0 into subOffsets(0) out of bounds
    require(idx.nSuper > 0, s"$what was given an EMPTY " +
      "two-level index (0 super-centroids): fit on a non-empty corpus, " +
      "or pass a non-empty prefitted index")
    if (vec == null) 0L
    else {
      val s = argmax(vec, isFloat, idx.dim, idx.superFlat, 0, idx.nSuper)
      val sub = argmax(vec, isFloat, idx.dim, idx.subFlat,
        idx.subOffsets(s), idx.subCounts(s))
      s.toLong * idx.stride + sub
    }
  }

  /** [[NearestInPacked]]'s body: the packed column must be present and
    * hold at least one dim-length centroid; NULL input vector → 0. */
  def nearestPacked(vec: ArrayData, isFloat: Boolean, dim: Int,
      flat: ArrayData, what: String): Int = {
    require(flat != null, s"$what: packed centroid column is NULL — " +
      "every joined row must carry its cell's centroids")
    val count = flat.numElements() / dim
    require(count >= 1, s"$what: packed centroid column holds " +
      s"${flat.numElements()} doubles — fewer than one dim=$dim centroid")
    if (vec == null) 0
    else argmaxInRow(vec, isFloat, dim, flat, count)
  }

  /** [[argmax]] reading the centroid matrix from per-row column DATA
    * (an `array<double>` holding `count = numElements/dim` centroids
    * row-major) instead of a broadcast — the kernel of the JOIN-based
    * assignment path, where each row's candidate centroids arrive from
    * a shuffle join rather than a driver-collected index. Identical
    * comparison semantics (NULL-sim loses, NaN greatest, ties → lowest
    * index); reads via `ArrayData.getDouble` so an UnsafeArrayData
    * packed row is scanned with zero per-row allocation. */
  def argmaxInRow(vec: ArrayData, isFloat: Boolean, dim: Int,
      flat: ArrayData, count: Int): Int = {
    val vLen = vec.numElements()
    val n = math.min(vLen, dim)
    var best = 0
    var bestSim = 0.0
    var bestValid = false
    var c = 0
    while (c < count) {
      val base = c * dim
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < n) {
        val xi = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val yi = flat.getDouble(base + i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      if (nx != 0.0 && ny != 0.0) {
        val sim = dot / (math.sqrt(nx) * math.sqrt(ny)) + 0.0
        val better =
          if (!bestValid) true
          else if (java.lang.Double.isNaN(sim)) !java.lang.Double.isNaN(bestSim)
          else if (java.lang.Double.isNaN(bestSim)) false
          else sim > bestSim
        if (better) { best = c; bestSim = sim; bestValid = true }
      }
      c += 1
    }
    best
  }
}

/** Whole-stage-codegen plumbing shared by the centroid kernels: the
  * broadcast handle rides the generated class's `references` array and
  * is dereferenced ONCE per class instance into a mutable slot (the
  * same once-per-JVM torrent read `eval` pays on first access); the
  * per-row call goes to the SAME [[CentroidKernel]] static body the
  * interpreted path runs, so the two paths cannot diverge. */
private[expressions] object CentroidCodegen {
  /** Fully-qualified kernel class — Scala emits static forwarders for
    * the object's methods, so generated Java calls them directly. */
  val kernel = "graft.functions.expressions.CentroidKernel"

  def broadcastCall(ctx: CodegenContext, ev: ExprCode, child: Expression,
      index: Broadcast[_], idxClass: String, method: String,
      isFloat: Boolean, what: String, retType: String): ExprCode = {
    val bc = ctx.addReferenceObj("centroidIndexBc", index,
      classOf[Broadcast[_]].getName)
    val idx = ctx.addMutableState(idxClass, "centroidIndex",
      v => s"$v = ($idxClass) $bc.value();")
    val c = child.genCode(ctx)
    val body =
      code"""
         |${c.code}
         |final $retType ${ev.value} = $kernel.$method(
         |  ${c.isNull} ? null : ${c.value}, $isFloat, $idx, "$what");
       """.stripMargin
    ev.copy(code = body, isNull = FalseLiteral)
  }
}

/** 0-based index of the nearest centroid of the broadcast flat matrix
  * (never null: a NULL/empty input vector resolves to 0, the all-NULL
  * tie — matching the literal form's `negidx` fallback). */
case class NearestCentroid(child: Expression, index: Broadcast[FlatCentroids])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    CentroidKernel.checkVecType(child.dataType, prettyName)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CentroidKernel.nearestFlat(v.asInstanceOf[ArrayData], isFloat,
      index.value, prettyName)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    CentroidCodegen.broadcastCall(ctx, ev, child, index,
      classOf[FlatCentroids].getName, "nearestFlat", isFloat, prettyName,
      "int")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_centroid"
}

/** Cell ID of the nearest centroid — [[NearestCentroid]] composed with
  * the broadcast's `ids` lookup, so cell ids never ship as a plan
  * literal either (at MaxFitCells a `typedlit(cellIds)` is ~131k boxed
  * Longs re-deserialized per task — the 1/dim-scale remnant of the
  * vector-literal pathology). A NULL input resolves to ids(0). */
case class NearestCentroidId(child: Expression, index: Broadcast[FlatCentroids])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    CentroidKernel.checkVecType(child.dataType, prettyName)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CentroidKernel.nearestFlatId(v.asInstanceOf[ArrayData], isFloat,
      index.value, prettyName)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    CentroidCodegen.broadcastCall(ctx, ev, child, index,
      classOf[FlatCentroids].getName, "nearestFlatId", isFloat, prettyName,
      "long")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_centroid_id"
}

/** Maps a positional centroid index (e.g. one exploded from
  * [[NearestCentroids]]) to its cell id through the broadcast. */
case class CentroidIdAt(child: Expression, index: Broadcast[FlatCentroids])
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(pos: Any): Any =
    index.value.ids(pos.asInstanceOf[Int])
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "centroid_id_at"
}

/** Top-`n` nearest centroid indexes (best first) of the broadcast flat
  * matrix — the probe-side complement of [[NearestCentroid]], replacing
  * `slice(sort_array(struct(cosine, -i-1) …), 1, n)` over a plan
  * literal with one insertion-selection loop per row. Ordering is the
  * same pinned comparator: sim desc (NaN greatest, -0.0 == 0.0),
  * NULL-sim cells rank below every non-NULL one, ties → lower index
  * first. Returns min(n, nCentroids) entries; a NULL input vector
  * yields indexes 0..min(n,nCentroids)-1 (the all-NULL-sims tie). */
case class NearestCentroids(child: Expression, index: Broadcast[FlatCentroids],
    n: Int) extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1 (got $n)")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    CentroidKernel.checkVecType(child.dataType, prettyName)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val idx = index.value
    val total = idx.n
    val keep = math.min(n, total)
    val v = child.eval(input)
    if (v == null)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array.tabulate(keep)(i => i: Any))
    val vec = v.asInstanceOf[ArrayData]
    val vLen = vec.numElements()
    val dim = idx.dim
    val m = math.min(vLen, dim)
    // parallel arrays of the current top `keep`, best first
    val topIdx = new Array[Int](keep)
    val topSim = new Array[Double](keep)
    val topValid = new Array[Boolean](keep)
    var size = 0
    var c = 0
    while (c < total) {
      var dot = 0.0; var nx = 0.0; var ny = 0.0
      var i = 0
      while (i < m) {
        val xi = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
        val yi = idx.flat(c * dim + i)
        dot += xi * yi; nx += xi * xi; ny += yi * yi
        i += 1
      }
      val valid = nx != 0.0 && ny != 0.0
      val sim = if (valid) dot / (math.sqrt(nx) * math.sqrt(ny)) + 0.0 else 0.0
      // find insertion point: strictly-better-than position (iterating
      // ascending c, strict comparison keeps lower index first on ties)
      var pos = size
      while (pos > 0 && better(valid, sim, topValid(pos - 1), topSim(pos - 1)))
        pos -= 1
      if (pos < keep) {
        val last = math.min(size, keep - 1)
        var j = last; while (j > pos) {
          topIdx(j) = topIdx(j - 1); topSim(j) = topSim(j - 1)
          topValid(j) = topValid(j - 1); j -= 1
        }
        topIdx(pos) = c; topSim(pos) = sim; topValid(pos) = valid
        if (size < keep) size += 1
      }
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      topIdx.take(size).map(i => i: Any))
  }
  // is (aValid, aSim) strictly better than (bValid, bSim)?
  private def better(aValid: Boolean, aSim: Double,
      bValid: Boolean, bSim: Double): Boolean =
    if (aValid != bValid) aValid
    else if (!aValid) false
    else if (java.lang.Double.isNaN(aSim)) !java.lang.Double.isNaN(bSim)
    else if (java.lang.Double.isNaN(bSim)) false
    else aSim > bSim
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "nearest_centroids"
}

/** 0-based index of the nearest centroid among the centroids PACKED
  * INTO THE ROW ITSELF: `flat` is an `array<double>` of
  * `numElements/dim` centroids laid out row-major (the per-super-cell
  * packed sub-centroid column a shuffle join attaches), `vec` the
  * query vector. This is the broadcast-free twin of
  * [[NearestCentroid]] — the index never passes through the driver,
  * so the centroid count is bounded by cluster memory, not by
  * [[graft.operators.Similarity.MaxFitCells]]. Same pinned ordering
  * (NULL-sim loses, NaN greatest, ties → lowest index); a NULL `vec`
  * resolves to 0 (the all-NULL tie); a NULL `flat` is refused loudly —
  * in the assignment plan it can only mean a broken join. */
case class NearestInPacked(left: Expression, right: Expression, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  require(dim >= 1, s"dim must be >= 1 (got $dim)")
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    CentroidKernel.checkVecType(left.dataType, prettyName) match {
      case TypeCheckResult.TypeCheckSuccess => right.dataType match {
        case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
        case other => TypeCheckResult.TypeCheckFailure(
          s"$prettyName expects a packed array<double> centroid " +
            s"column, got $other")
      }
      case fail => fail
    }
  private lazy val isFloat =
    left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val f = right.eval(input)
    val v = left.eval(input)
    CentroidKernel.nearestPacked(v.asInstanceOf[ArrayData], isFloat, dim,
      f.asInstanceOf[ArrayData], prettyName)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val l = left.genCode(ctx)
    val r = right.genCode(ctx)
    val body =
      code"""
         |${l.code}
         |${r.code}
         |final int ${ev.value} = ${CentroidCodegen.kernel}.nearestPacked(
         |  ${l.isNull} ? null : ${l.value}, $isFloat, $dim,
         |  ${r.isNull} ? null : ${r.value}, "$prettyName");
       """.stripMargin
    ev.copy(code = body, isNull = FalseLiteral)
  }
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
  override def prettyName: String = "nearest_in_packed"
}

/** Composite two-level cell id (super·stride + sub) against the
  * broadcast two-level index: the two argmaxes of
  * [[graft.operators.Similarity.twoLevelAssign]] fused into one
  * per-row call — O(nSuper + subCounts(s)) cosines, no plan literal. */
case class TwoLevelNearestCell(child: Expression,
    index: Broadcast[TwoLevelFlatIndex])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def checkInputDataTypes(): TypeCheckResult =
    CentroidKernel.checkVecType(child.dataType, prettyName)
  private lazy val isFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    CentroidKernel.twoLevelCell(v.asInstanceOf[ArrayData], isFloat,
      index.value, prettyName)
  }
  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    CentroidCodegen.broadcastCall(ctx, ev, child, index,
      classOf[TwoLevelFlatIndex].getName, "twoLevelCell", isFloat,
      prettyName, "long")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
  override def prettyName: String = "two_level_nearest_cell"
}
