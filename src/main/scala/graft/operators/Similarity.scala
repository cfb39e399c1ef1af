package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{CosineSimilarity, HyperplaneLsh}

/** Similarity search over an embedding column (array<float>).
  *
  * Two paths, per the pipeline mandate:
  *  - `bruteForceTopK` — exact baseline. The query side is broadcast
  *    (small by construction); the corpus streams through a map-side
  *    cosine kernel + per-query top-k. At 100 TB the corpus never
  *    shuffles: broadcast-join → window rank is one stage.
  *  - `lshTopK` / `cosinePairs(lsh=true)` — hyperplane-LSH bucketing:
  *    candidates only where signature bands collide, exact cosine
  *    re-ranks. Recall tunable via (bits, bands).
  */
object Similarity {

  def cosine(a: Column, b: Column): Column = toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  /** Signature column: 64-bit hyperplane LSH fingerprint. */
  def lshSignature(vec: Column, bits: Int = 64, seed: Long = 42L): Column =
    toCol(HyperplaneLsh(toExpr(vec), bits, seed))

  /** Exact top-k cosine neighbors for each query vector. `queries` must
    * be broadcast-small; excludes self-matches on id equality. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int): DataFrame = {
    val joined = corpus.join(broadcast(queries), col(corpusId) =!= col(queryId))
      .withColumn("cos_sim", cosine(col(queryVec), col(corpusVec)))
    val w = Window.partitionBy(col(queryId))
      .orderBy(col("cos_sim").desc, col(corpusId))
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** ANN top-k via banded hyperplane signatures: a candidate must share
    * at least one of `bands` signature chunks with the query, then exact
    * cosine ranks candidates. Misses are possible (that's the A in ANN);
    * recall rises with bands. */
  def lshTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int, bits: Int = 64, bands: Int = 16, seed: Long = 42L): DataFrame = {
    val width = bits / bands
    def banded(df: DataFrame, idCol: String, vecCol: String, prefix: String): DataFrame = {
      val sig = lshSignature(col(vecCol), bits, seed)
      val chunks = (0 until bands).map(c =>
        shiftrightunsigned(col(s"${prefix}_sig"), c * width).bitwiseAND(lit((1L << width) - 1)))
      df.select(col(idCol).as(s"${prefix}_id"), col(vecCol).as(s"${prefix}_vec"),
          sig.as(s"${prefix}_sig"))
        .select(col(s"${prefix}_id"), col(s"${prefix}_vec"), posexplode(array(chunks: _*)))
        .withColumnsRenamed(Map("pos" -> "chunk", "col" -> s"${prefix}_chunk_val"))
    }
    val cb = banded(corpus, corpusId, corpusVec, "c")
    val qb = banded(queries, queryId, queryVec, "q")
    val cands = cb.join(qb,
        cb("chunk") === qb("chunk") && col("c_chunk_val") === col("q_chunk_val") &&
          col("c_id") =!= col("q_id"))
      .select(col("q_id"), col("c_id"), col("q_vec"), col("c_vec"))
      .distinct()
    val w = Window.partitionBy(col("q_id")).orderBy(col("cos_sim").desc, col("c_id"))
    cands
      .withColumn("cos_sim", cosine(col("q_vec"), col("c_vec")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id").as("query_id"), col("rank"),
        col("c_id").as("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** ANN top-k via an IVF (inverted-file) index: deterministic centroid
    * sample → every corpus vector assigned to its nearest centroid (one
    * broadcast join, no shuffle of the corpus) → each query probes only
    * the `nProbe` nearest cells. Coarser than LSH banding but gives the
    * classic tunable recall/cost dial (`nCells`, `nProbe`); at 100 TB
    * the cell assignment is a one-off narrow pass and queries touch
    * ~nProbe/nCells of the corpus.
    *
    * Centroids are the corpus vectors with the `nCells` smallest ids —
    * deterministic, no iterative clustering; a k-means refinement would
    * drop in without changing the plan shape.
    */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
      corpusId: String, corpusVec: String, queryId: String, queryVec: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4): DataFrame = {
    val centroids = corpus
      .orderBy(col(corpusId)).limit(nCells)
      .select(col(corpusId).as("cell_id"), col(corpusVec).as("cell_vec"))

    // assign corpus vectors to nearest centroid (broadcast, map-side)
    val wAssign = Window.partitionBy(col(corpusId)).orderBy(
      col("cell_sim").desc, col("cell_id"))
    val assigned = corpus.join(broadcast(centroids))
      .withColumn("cell_sim", cosine(col(corpusVec), col("cell_vec")))
      .withColumn("cell_rank", row_number().over(wAssign))
      .filter(col("cell_rank") === 1)
      .select(col(corpusId), col(corpusVec), col("cell_id"))

    // each query probes its nProbe nearest cells
    val wProbe = Window.partitionBy(col(queryId)).orderBy(
      col("q_cell_sim").desc, col("cell_id"))
    val probes = queries.join(broadcast(centroids))
      .withColumn("q_cell_sim", cosine(col(queryVec), col("cell_vec")))
      .withColumn("probe_rank", row_number().over(wProbe))
      .filter(col("probe_rank") <= nProbe)
      .select(col(queryId), col(queryVec), col("cell_id"))

    val wRank = Window.partitionBy(col(queryId)).orderBy(col("cos_sim").desc, col(corpusId))
    probes.join(assigned, Seq("cell_id"))
      .filter(col(corpusId) =!= col(queryId))
      .withColumn("cos_sim", cosine(col(queryVec), col(corpusVec)))
      .withColumn("rank", row_number().over(wRank))
      .filter(col("rank") <= k)
      .select(col(queryId).as("query_id"), col("rank"),
        col(corpusId).as("neighbor_id"), round(col("cos_sim"), 6).as("cos_sim"))
  }

  /** All corpus pairs with cosine >= threshold (embedding near-dup).
    * lsh=false: exact all-pairs (self-join, for oracle-checkable truth
    * at test scale). lsh=true: banded-signature candidates only — the
    * 100 TB path. */
  def cosinePairs(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double, lsh: Boolean = false,
      bits: Int = 64, bands: Int = 16, seed: Long = 42L): DataFrame = {
    val base =
      if (!lsh) {
        val a = df.select(col(idCol).as("a_id"), col(vecCol).as("a_vec"))
        val b = df.select(col(idCol).as("b_id"), col(vecCol).as("b_vec"))
        a.join(b, col("a_id") < col("b_id"))
      } else {
        val width = bits / bands
        val sigd = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
          .withColumn("sig", lshSignature(col("vec"), bits, seed))
        val chunks = (0 until bands).map(c =>
          shiftrightunsigned(col("sig"), c * width).bitwiseAND(lit((1L << width) - 1)))
        val banded = sigd.select(col("id"), col("vec"), posexplode(array(chunks: _*)))
        banded.select(col("pos"), col("col"), col("id").as("a_id"), col("vec").as("a_vec"))
          .join(banded.select(col("pos"), col("col"), col("id").as("b_id"), col("vec").as("b_vec")),
            Seq("pos", "col"))
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("a_vec"), col("b_id"), col("b_vec"))
          .distinct()
      }
    base
      .withColumn("cos_sim", cosine(col("a_vec"), col("b_vec")))
      .filter(col("cos_sim") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("cos_sim"), 6).as("cos_sim"))
  }
}
