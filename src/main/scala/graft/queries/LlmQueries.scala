package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Engine
import graft.operators.{Dedup, Multimodal, Similarity, TextAnalysis}

/** LLM-data-pipeline operator coverage (builder mandate; beyond the
  * reference's surface — its COSINE_SIMILARITY is declared-but-
  * unimplemented, filter.rs:3306). Exact variants carry DuckDB oracles;
  * probabilistic variants (LSH/simhash ANN) are rows-only here and
  * recall-tested against the exact variants in the ScalaTest suite.
  *
  * Data note (sf0.01 documents): no exact text duplicates, 21 same-
  * vocabulary groups, planted near-dup pairs at 3-gram Jaccard ≥ 0.95
  * with the next pair at ≤ 0.2 — thresholds below sit in the gaps.
  */
object LlmQueries extends QueryCatalog {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Engine.t(s, dir, name)

  private val canonicalVocabDuck =
    "md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))"

  /** Exact dedup on a canonical key (sorted distinct vocabulary). */
  private val dedupExact = Q(
    "dedup_exact",
    Some(s"""
      SELECT $canonicalVocabDuck AS dup_key, min(doc_id) AS keep_id, count(*) AS group_size
      FROM documents
      GROUP BY $canonicalVocabDuck
      ORDER BY keep_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val canonical = array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
      Dedup.exact(docs, canonical, col("doc_id")).orderBy(col("keep_id"))
    })

  private def jaccardOracle(threshold: Double) = s"""
      WITH g AS (SELECT doc_id,
                        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       FOR i IN generate_series(1, len(w) - 2)]) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             round(len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
      FROM g a JOIN g b ON a.doc_id < b.doc_id
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= $threshold
      ORDER BY a_id, b_id"""

  /** Exact 3-gram Jaccard near-dup pairs via inverted-index join. */
  private val dedupJaccard = Q(
    "dedup_ngram_jaccard",
    Some(jaccardOracle(0.5)),
    (s, dir) =>
      Dedup.jaccardPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          n = 3, threshold = 0.5)
        .orderBy(col("a_id"), col("b_id")))

  /** MinHash+LSH near-dup: candidates from 16x4 banding, exact-Jaccard
    * verified. At this data's similarity gap (>=0.95 vs <=0.2) recall is
    * 1 - (1-0.95^4)^16 ≈ 1-2e-13, so the exact-Jaccard oracle applies. */
  private val dedupMinhash = Q(
    "dedup_minhash_lsh",
    Some(jaccardOracle(0.5)),
    (s, dir) =>
      Dedup.minhashLshPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          n = 3, bands = 16, rowsPerBand = 4, threshold = 0.5)
        .orderBy(col("a_id"), col("b_id")))

  /** DuckDB reconstruction of SimHash64 (FNV-1a per token via hex-nibble
    * list_reduce, ±1 bit votes, sign → fingerprint) — byte-exact vs the
    * Catalyst expression, so the pigeonhole-banded pair search is fully
    * oracle-checked (banding recall is exactly 1 for maxHamming < chunks,
    * so the oracle is simply ALL pairs with hamming <= 7). */
  private val simhashDuck = """
      WITH toks AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
      hx AS (SELECT doc_id, string_split(hex(encode(tok)), '') AS h FROM toks),
      th AS (SELECT doc_id,
               CAST(list_reduce(list_prepend(14695981039346656037::HUGEINT,
                 [ (strpos('0123456789ABCDEF', h[2*i-1])-1)*16 + (strpos('0123456789ABCDEF', h[2*i])-1)
                   FOR i IN generate_series(1, len(h)//2) ]),
                 (a, x) -> (xor(a, x::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS UBIGINT) AS th
             FROM hx),
      votes AS (SELECT doc_id, b, sum(CASE WHEN (th >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
                FROM th CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS b) GROUP BY doc_id, b),
      fps AS (SELECT doc_id, CAST(CASE WHEN fpu >= 9223372036854775808::HUGEINT
                                       THEN fpu - 18446744073709551616::HUGEINT ELSE fpu END AS BIGINT) AS fp
              FROM (SELECT doc_id, sum(CASE WHEN v > 0 THEN (1::UBIGINT << b)::HUGEINT ELSE 0::HUGEINT END) AS fpu
                    FROM votes GROUP BY doc_id) x)
      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
             CAST(bit_count(xor(a.fp, b.fp)) AS BIGINT) AS hamming
      FROM fps a JOIN fps b ON a.doc_id < b.doc_id
      WHERE bit_count(xor(a.fp, b.fp)) <= 7
      ORDER BY a_id, b_id"""

  /** SimHash near-dup (Hamming <= 7 over 8 chunks), full DuckDB oracle. */
  private val dedupSimhash = Q(
    "dedup_simhash",
    Some(simhashDuck),
    (s, dir) =>
      Dedup.simhashPairs(t(s, dir, "documents"), col("doc_id"), col("text"),
          maxHamming = 7, chunks = 8)
        .select(col("a_id"), col("b_id"), col("hamming").cast("long").as("hamming"))
        .orderBy(col("a_id"), col("b_id")))

  /** Near-dup pairs → dedup CLUSTERS via connected components (min-label
    * propagation). Oracle: DuckDB recursive CTE computes the transitive
    * closure of the same exact-Jaccard pair set and takes min reachable
    * id per node — the textbook definition the iterative Spark algorithm
    * must agree with. Singletons keep themselves. */
  private val dedupCluster = Q(
    "dedup_cluster",
    Some("""
      WITH RECURSIVE g AS (SELECT doc_id,
                        list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                       FOR i IN generate_series(1, len(w) - 2)]) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id
            FROM g a JOIN g b ON a.doc_id < b.doc_id
            WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                  / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      edges AS (SELECT a_id AS src, b_id AS dst FROM p
                UNION SELECT b_id, a_id FROM p),
      reach AS (SELECT src AS id, src AS r FROM edges
                UNION
                SELECT e.src AS id, reach.r FROM edges e JOIN reach ON e.dst = reach.id),
      comp AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id),
      assigned AS (SELECT d.doc_id, coalesce(c.cluster_id, d.doc_id) AS cluster_id
                   FROM documents d LEFT JOIN comp c ON d.doc_id = c.id)
      SELECT doc_id, cluster_id,
             count(*) OVER (PARTITION BY cluster_id) AS cluster_size,
             CAST(CASE WHEN doc_id = cluster_id THEN 1 ELSE 0 END AS INT) AS is_canonical
      FROM assigned ORDER BY doc_id"""),
    (s, dir) =>
      Dedup.clusters(t(s, dir, "documents"), col("doc_id"), col("text"),
          n = 3, threshold = 0.5)
        .select(col("doc_id"), col("cluster_id"), col("cluster_size"),
          col("is_canonical"))
        .orderBy(col("doc_id")))

  /** Incremental dedup: docs 400+ play the freshly-ingested batch,
    * checked against the existing corpus (docs < 400) via cross-table
    * LSH banding — corpus×corpus pairs never generated. Oracle: exact
    * cross-table Jaccard (banding recall ≈ 1 at this data's gap, as for
    * `dedup_minhash_lsh`). */
  private val dedupIncremental = Q(
    "dedup_incremental",
    Some("""
      WITH g AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               FOR i IN generate_series(1, len(w) - 2)]) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      SELECT a.doc_id AS new_id, b.doc_id AS corpus_id,
             round(len(list_intersect(a.sh, b.sh))::DOUBLE
                   / len(list_distinct(list_concat(a.sh, b.sh))), 4) AS jaccard
      FROM g a JOIN g b ON a.doc_id >= 400 AND b.doc_id < 400
      WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
            / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5
      ORDER BY new_id, corpus_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
      Dedup.incrementalLshPairs(
          docs.filter(col("doc_id") >= 400), docs.filter(col("doc_id") < 400),
          col("doc_id"), col("text"), n = 3, bands = 16, rowsPerBand = 4,
          threshold = 0.5)
        .orderBy(col("new_id"), col("corpus_id"))
    })

  /** Span-level exact dedup (Lee et al. 2021): per-doc stats of maximal
    * token runs covered by corpus-duplicated 8-grams. DuckDB mirrors the
    * positional-gram index, HAVING count>1 duplicate set, and the
    * lag-based interval merge step for step; all counts integer, one
    * rounded division. */
  private val dedupSpans = Q(
    "dedup_spans",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      base AS (SELECT doc_id, ts, len(ts) AS n_tokens FROM d),
      p AS (SELECT doc_id, ts, CAST(unnest(generate_series(1, n_tokens - 8 + 1)) AS BIGINT) AS pos
            FROM base WHERE n_tokens >= 8),
      g AS (SELECT doc_id, pos, array_to_string(ts[pos:pos+7], ' ') AS gram FROM p),
      dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
      hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
      isl AS (SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                                              -1000000) + 7 THEN 1 ELSE 0 END AS ni
              FROM hits),
      isl2 AS (SELECT doc_id, pos,
                      sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS island
               FROM isl),
      spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 7 AS e
                FROM isl2 GROUP BY doc_id, island),
      per AS (SELECT doc_id, count(*) AS n_spans,
                     CAST(sum(e - s + 1) AS BIGINT) AS dup_tokens
              FROM spans GROUP BY doc_id)
      SELECT b.doc_id, coalesce(n_spans, 0) AS n_spans,
             coalesce(dup_tokens, 0) AS dup_tokens,
             round(CAST(coalesce(dup_tokens, 0) AS DOUBLE) / n_tokens, 6) AS dup_frac
      FROM base b LEFT JOIN per USING (doc_id) ORDER BY doc_id"""),
    (s, dir) =>
      Dedup.duplicateSpans(t(s, dir, "documents"), col("doc_id"), col("text"), k = 8)
        .orderBy(col("doc_id")))

  /** The cut step on the same span set: cleaned corpus with duplicate
    * spans excised (fully-duplicated docs collapse to empty strings —
    * DuckDB's array_to_string(empty) is NULL where Spark's array_join
    * is '', hence the coalesce). */
  private val dedupSpansCut = Q(
    "dedup_spans_cut",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text,' ') AS ts FROM documents),
      base AS (SELECT doc_id, ts, len(ts) AS n_tokens FROM d),
      p AS (SELECT doc_id, ts, CAST(unnest(generate_series(1, n_tokens - 8 + 1)) AS BIGINT) AS pos
            FROM base WHERE n_tokens >= 8),
      g AS (SELECT doc_id, pos, array_to_string(ts[pos:pos+7], ' ') AS gram FROM p),
      dup AS (SELECT gram FROM g GROUP BY gram HAVING count(*) > 1),
      hits AS (SELECT doc_id, pos FROM g JOIN dup USING (gram)),
      isl AS (SELECT doc_id, pos,
                     CASE WHEN pos > coalesce(lag(pos) OVER (PARTITION BY doc_id ORDER BY pos),
                                              -1000000) + 7 THEN 1 ELSE 0 END AS ni
              FROM hits),
      isl2 AS (SELECT doc_id, pos,
                      sum(ni) OVER (PARTITION BY doc_id ORDER BY pos
                                    ROWS UNBOUNDED PRECEDING) AS island
               FROM isl),
      spans AS (SELECT doc_id, island, min(pos) AS s, max(pos) + 7 AS e
                FROM isl2 GROUP BY doc_id, island),
      per AS (SELECT doc_id, list(struct_pack(s := s, e := e)) AS sps
              FROM spans GROUP BY doc_id),
      kept AS (SELECT b.doc_id, b.ts,
                      [i FOR i IN generate_series(1, b.n_tokens)
                       IF len(list_filter(coalesce(sps, []),
                                          sp -> i >= sp.s AND i <= sp.e)) = 0] AS ki
               FROM base b LEFT JOIN per USING (doc_id))
      SELECT doc_id,
             coalesce(array_to_string([ts[i] FOR i IN ki], ' '), '') AS cleaned,
             CAST(len(ki) AS BIGINT) AS kept_tokens
      FROM kept ORDER BY doc_id"""),
    (s, dir) =>
      Dedup.exciseDuplicateSpans(t(s, dir, "documents"), col("doc_id"), col("text"), k = 8)
        .orderBy(col("doc_id")))

  /** Embedding near-dup: exact all-pairs cosine >= 0.35 (data max 0.46). */
  private val dedupEmbedding = Q(
    "dedup_embedding",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
      SELECT a.vec_id AS a_id, b.vec_id AS b_id,
             round(list_cosine_similarity(a.v, b.v), 6) AS cos_sim
      FROM e a JOIN e b ON a.vec_id < b.vec_id
      WHERE list_cosine_similarity(a.v, b.v) >= 0.35
      ORDER BY a_id, b_id"""),
    (s, dir) =>
      Similarity.cosinePairs(t(s, dir, "embeddings"), "vec_id", "embedding",
          threshold = 0.35, lsh = false)
        .orderBy(col("a_id"), col("b_id")))

  /** DuckDB re-derivation of the engine's k-means fit (nCells=8,
    * iters=2), unrolled: seeds = the 8 lowest-id vectors; each Lloyd
    * round = argmax-cosine assignment (tie → lowest centroid index,
    * matching the engine's struct-max) + per-dimension means snapped to
    * 9 decimals (the engine quantizes its means identically, which is
    * what makes the two independent fits land on the same centroids);
    * an emptied cell keeps its PREVIOUS centroid. The minimum
    * best-vs-second assignment margin on this data is ~7e-5 at every
    * SF — six orders above cross-engine float noise. Ends with `af` =
    * (vec_id, v, cell_id). */
  private val kmeansDuck = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      c0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, vec_id AS cell_id, v AS cv
             FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 8)),
      a1 AS (SELECT vec_id, v, cell_id FROM (
               SELECT e.vec_id, e.v, c.cell_id,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN c0 c) WHERE rn = 1),
      m1 AS (SELECT cell_id, list(m ORDER BY i) AS mv FROM (
               SELECT a1.cell_id, g.i, round(avg(a1.v[g.i]), 9) AS m
               FROM a1, generate_series(1, 64) g(i) GROUP BY a1.cell_id, g.i)
             GROUP BY cell_id),
      c1 AS (SELECT c0.idx, c0.cell_id, coalesce(m1.mv, c0.cv) AS cv
             FROM c0 LEFT JOIN m1 USING (cell_id)),
      a2 AS (SELECT vec_id, v, cell_id FROM (
               SELECT e.vec_id, e.v, c.cell_id,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN c1 c) WHERE rn = 1),
      m2 AS (SELECT cell_id, list(m ORDER BY i) AS mv FROM (
               SELECT a2.cell_id, g.i, round(avg(a2.v[g.i]), 9) AS m
               FROM a2, generate_series(1, 64) g(i) GROUP BY a2.cell_id, g.i)
             GROUP BY cell_id),
      c2 AS (SELECT c1.idx, c1.cell_id, coalesce(m2.mv, c1.cv) AS cv
             FROM c1 LEFT JOIN m2 USING (cell_id)),
      af AS (SELECT vec_id, v, cell_id FROM (
               SELECT e.vec_id, e.v, c.cell_id,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN c2 c) WHERE rn = 1)"""

  /** Lloyd-refined k-means assignment as a catalog row — the clustering
    * primitive under IVF and SemDeDup, oracle-checked end-to-end (the
    * DuckDB side re-runs the whole fit + assignment independently). */
  private val clusterKmeans = Q(
    "cluster_kmeans",
    Some(s"""$kmeansDuck
      SELECT vec_id, cell_id FROM af ORDER BY vec_id"""),
    (s, dir) =>
      Similarity.kmeansAssign(t(s, dir, "embeddings"), "vec_id", "embedding",
          nCells = 8, iters = 2)
        .select(col("vec_id"), col("cell_id"))
        .orderBy(col("vec_id")))

  /** SemDeDup: k-means cells confine the quadratic pair scan; a vector
    * is dropped if a lower-id cell-mate has cosine >= 0.35 (`dup_of` =
    * smallest witness, NULL = kept). Same 0.35 threshold as
    * `dedup_embedding`, whose margin analysis carries over. */
  private val dedupSemantic = Q(
    "dedup_semantic",
    Some(s"""$kmeansDuck
      SELECT a.vec_id AS vec_id, a.cell_id AS cell_id, min(b.vec_id) AS dup_of
      FROM af a LEFT JOIN af b
        ON b.cell_id = a.cell_id AND b.vec_id < a.vec_id
       AND list_cosine_similarity(a.v, b.v) >= 0.35
      GROUP BY a.vec_id, a.cell_id
      ORDER BY vec_id"""),
    (s, dir) =>
      Similarity.semanticDedup(t(s, dir, "embeddings"), "vec_id", "embedding",
          nCells = 8, iters = 2, threshold = 0.35)
        .orderBy(col("vec_id")))

  /** DuckDB re-derivation of the ENTIRE two-level (IMI-style) fit —
    * the same discipline as [[kmeansDuck]] extended one level down:
    * super fit (3 seeds by lowest vec_id, 2 Lloyd rounds, 1e-9-
    * quantized means), per-vector super assignment against the FINAL
    * super centroids, sub seeds = first 3 members by vec_id per super
    * cell (super centroid fallback for empty cells), stride = max
    * actual sub count, 2 composite-cell Lloyd rounds (emptied sub-cell
    * keeps its centroid), then the two-argmax assignment and the
    * within-cell lower-id witness. Every tie breaks (sim DESC, index
    * ASC) exactly as [[graft.functions.expressions.CentroidKernel]]
    * pins them. */
  private val twoLevelDuck = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      s0 AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS idx, v AS cv
             FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 3)),
      sa1 AS (SELECT vec_id, v, idx FROM (
               SELECT e.vec_id, e.v, c.idx,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN s0 c) WHERE rn = 1),
      sm1 AS (SELECT idx, list(m ORDER BY i) AS mv FROM (
               SELECT sa1.idx, g.i, round(avg(sa1.v[g.i]), 9) AS m
               FROM sa1, generate_series(1, 64) g(i) GROUP BY sa1.idx, g.i)
             GROUP BY idx),
      s1 AS (SELECT s0.idx, coalesce(sm1.mv, s0.cv) AS cv
             FROM s0 LEFT JOIN sm1 USING (idx)),
      sa2 AS (SELECT vec_id, v, idx FROM (
               SELECT e.vec_id, e.v, c.idx,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN s1 c) WHERE rn = 1),
      sm2 AS (SELECT idx, list(m ORDER BY i) AS mv FROM (
               SELECT sa2.idx, g.i, round(avg(sa2.v[g.i]), 9) AS m
               FROM sa2, generate_series(1, 64) g(i) GROUP BY sa2.idx, g.i)
             GROUP BY idx),
      s2 AS (SELECT s1.idx, coalesce(sm2.mv, s1.cv) AS cv
             FROM s1 LEFT JOIN sm2 USING (idx)),
      sv AS (SELECT vec_id, v, idx AS s FROM (
               SELECT e.vec_id, e.v, c.idx,
                      row_number() OVER (PARTITION BY e.vec_id
                                         ORDER BY list_cosine_similarity(e.v, c.cv) DESC,
                                                  c.idx) AS rn
               FROM e CROSS JOIN s2 c) WHERE rn = 1),
      b0 AS (SELECT s, rn - 1 AS b, v AS cv FROM (
               SELECT s, vec_id, v,
                      row_number() OVER (PARTITION BY s ORDER BY vec_id) AS rn
               FROM sv) WHERE rn <= 3),
      b0f AS (SELECT * FROM b0
              UNION ALL
              SELECT s2.idx AS s, 0 AS b, s2.cv FROM s2
              WHERE s2.idx NOT IN (SELECT DISTINCT s FROM b0)),
      st AS (SELECT greatest(max(cnt), 1) AS stride FROM
               (SELECT s, count(*) AS cnt FROM b0f GROUP BY s)),
      ba1 AS (SELECT vec_id, v, s, b FROM (
               SELECT sv.vec_id, sv.v, sv.s, c.b,
                      row_number() OVER (PARTITION BY sv.vec_id
                                         ORDER BY list_cosine_similarity(sv.v, c.cv) DESC,
                                                  c.b) AS rn
               FROM sv JOIN b0f c ON c.s = sv.s) WHERE rn = 1),
      bm1 AS (SELECT s, b, list(m ORDER BY i) AS mv FROM (
               SELECT ba1.s, ba1.b, g.i, round(avg(ba1.v[g.i]), 9) AS m
               FROM ba1, generate_series(1, 64) g(i) GROUP BY ba1.s, ba1.b, g.i)
             GROUP BY s, b),
      b1 AS (SELECT b0f.s, b0f.b, coalesce(bm1.mv, b0f.cv) AS cv
             FROM b0f LEFT JOIN bm1 USING (s, b)),
      ba2 AS (SELECT vec_id, v, s, b FROM (
               SELECT sv.vec_id, sv.v, sv.s, c.b,
                      row_number() OVER (PARTITION BY sv.vec_id
                                         ORDER BY list_cosine_similarity(sv.v, c.cv) DESC,
                                                  c.b) AS rn
               FROM sv JOIN b1 c ON c.s = sv.s) WHERE rn = 1),
      bm2 AS (SELECT s, b, list(m ORDER BY i) AS mv FROM (
               SELECT ba2.s, ba2.b, g.i, round(avg(ba2.v[g.i]), 9) AS m
               FROM ba2, generate_series(1, 64) g(i) GROUP BY ba2.s, ba2.b, g.i)
             GROUP BY s, b),
      b2 AS (SELECT b1.s, b1.b, coalesce(bm2.mv, b1.cv) AS cv
             FROM b1 LEFT JOIN bm2 USING (s, b)),
      af2 AS (SELECT vec_id, v, s, b FROM (
               SELECT sv.vec_id, sv.v, sv.s, c.b,
                      row_number() OVER (PARTITION BY sv.vec_id
                                         ORDER BY list_cosine_similarity(sv.v, c.cv) DESC,
                                                  c.b) AS rn
               FROM sv JOIN b2 c ON c.s = sv.s) WHERE rn = 1),
      cells AS (SELECT vec_id, v,
                       s * (SELECT stride FROM st) + b AS cell_id FROM af2)"""

  /** Two-level SemDeDup as a full-oracle catalog row: the DuckDB side
    * independently re-runs the whole IMI-style fit (super Lloyd, sub
    * seeding, composite-cell Lloyd, ragged-aware stride) and the
    * cell-confined witness scan — closing the oracle gap on the scale
    * path the 20M/50k-cell SCALE.md anchor exercises. */
  private val dedupSemantic2 = Q(
    "dedup_semantic2",
    Some(s"""$twoLevelDuck
      SELECT a.vec_id AS vec_id, a.cell_id AS cell_id, min(b.vec_id) AS dup_of
      FROM cells a LEFT JOIN cells b
        ON b.cell_id = a.cell_id AND b.vec_id < a.vec_id
       AND list_cosine_similarity(a.v, b.v) >= 0.35
      GROUP BY a.vec_id, a.cell_id
      ORDER BY vec_id"""),
    (s, dir) =>
      Similarity.semanticDedupTwoLevel(t(s, dir, "embeddings"),
          "vec_id", "embedding", nSuper = 3, nSubPerCell = 3, iters = 2,
          threshold = 0.35)
        .orderBy(col("vec_id")))

  /** The RELATION-INDEXED two-level path (r17 — the beyond-MaxFitCells
    * scale story) under the SAME independent oracle as
    * [[dedupSemantic2]]: the distributed fit and the join-based
    * assignment are bit-identical to the collect/broadcast path
    * (RelIndexSpec), so DuckDB's from-scratch re-derivation of the fit
    * must match this row exactly too — a driver-green proof that the
    * no-driver-collect path computes the same answer, not just a
    * Spark-vs-Spark parity claim. */
  private val dedupSemantic2Rel = Q(
    "dedup_semantic2_rel",
    dedupSemantic2.oracle,
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.semanticDedupTwoLevelRel(emb, "vec_id", "embedding",
          threshold = 0.35,
          indexRel = Similarity.kmeansTwoLevelRel(emb, "vec_id",
            "embedding", nSuper = 3, nSubPerCell = 3, iters = 2))
        .orderBy(col("vec_id"))
    })

  /** Banded hyperplane-LSH signature chunks, re-derived in DuckDB from
    * the engine's own MD5-Rademacher construction (64 bits → 16 width-4
    * band chunks, seed 42) — expects a CTE `e` = (vec_id, v DOUBLE[])
    * in scope; yields `chunks` = (vec_id, chunk, cval). Shared by the
    * partial-probe ANN oracle and the semdedup LSH-union oracle. */
  private val lshChunksDuck = """
      bi AS (SELECT b.b, i.i
             FROM (SELECT unnest(generate_series(0, 63)) AS b) b
             CROSS JOIN (SELECT unnest(generate_series(0, 63)) AS i) i),
      planes AS (SELECT b,
                        list(CASE WHEN substr(md5('graft-lsh:42:' || b || ':' || i), 2, 1)
                                       IN ('0','2','4','6','8','a','c','e')
                                  THEN 1.0 ELSE -1.0 END ORDER BY i) AS pw
                 FROM bi GROUP BY b),
      dots AS (SELECT e.vec_id, p.b,
                      list_sum([e.v[i] * p.pw[i] FOR i IN generate_series(1, 64)]) AS dot
               FROM e CROSS JOIN planes p),
      chunks AS (SELECT vec_id, b // 4 AS chunk,
                        sum(CASE WHEN dot >= 0 THEN 1 ELSE 0 END
                            * CASE b % 4 WHEN 0 THEN 1 WHEN 1 THEN 2 WHEN 2 THEN 4 ELSE 8 END) AS cval
                 FROM dots GROUP BY vec_id, b // 4)"""

  /** Two-level SemDeDup with the LSH-UNION recall recovery
    * (`lshUnion = true`): near-dup pairs that the fine k-means grid
    * splits across cell boundaries are recovered through a second,
    * band-confined candidate source — hyperplane-LSH chunk collisions —
    * and `dup_of` is the smallest witness from EITHER source. The
    * oracle re-derives BOTH sources independently: the entire two-level
    * fit ([[twoLevelDuck]]) for the cell witness, and the engine's
    * MD5-Rademacher signatures ([[lshChunksDuck]]) for the LSH witness,
    * then merges them with the same null-skipping `least`. */
  private val dedupSemantic2Union = Q(
    "dedup_semantic2_union",
    Some(s"""$twoLevelDuck,
      $lshChunksDuck,
      cellwit AS (
        SELECT a.vec_id, a.cell_id, min(b.vec_id) AS dup_of
        FROM cells a LEFT JOIN cells b
          ON b.cell_id = a.cell_id AND b.vec_id < a.vec_id
         AND list_cosine_similarity(a.v, b.v) >= 0.35
        GROUP BY a.vec_id, a.cell_id),
      cool AS (
        SELECT chunk, cval FROM chunks
        GROUP BY chunk, cval HAVING count(*) <= 10000),
      pruned AS (
        SELECT c.vec_id, c.chunk, c.cval
        FROM chunks c JOIN cool USING (chunk, cval)),
      lshwit AS (
        SELECT ca.vec_id AS a_id, min(cb.vec_id) AS lsh_dup_of
        FROM pruned ca
        JOIN pruned cb ON cb.chunk = ca.chunk AND cb.cval = ca.cval
                      AND cb.vec_id < ca.vec_id
        JOIN e ea ON ea.vec_id = ca.vec_id
        JOIN e eb ON eb.vec_id = cb.vec_id
        WHERE list_cosine_similarity(ea.v, eb.v) >= 0.35
        GROUP BY ca.vec_id)
      SELECT c.vec_id, c.cell_id, least(c.dup_of, l.lsh_dup_of) AS dup_of
      FROM cellwit c LEFT JOIN lshwit l ON l.a_id = c.vec_id
      ORDER BY vec_id"""),
    (s, dir) =>
      Similarity.semanticDedupTwoLevel(t(s, dir, "embeddings"),
          "vec_id", "embedding", nSuper = 3, nSubPerCell = 3, iters = 2,
          threshold = 0.35, lshUnion = true)
        .orderBy(col("vec_id")))

  /** Exact top-k oracle — shared by the brute-force baseline AND the
    * full-probe ANN variants (probing every cell/band reduces ANN to
    * exact search, so the same SQL applies verbatim). */
  private val bruteTopkDuck = """
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
           q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
           scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                             list_cosine_similarity(qv, e.v) AS sim
                      FROM q JOIN e ON e.vec_id <> q.query_id)
      SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
      FROM (SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored) x
      WHERE rank <= 5
      ORDER BY query_id, rank"""

  /** Exact brute-force cosine top-5 for 5 query vectors (ANN baseline). */
  private val annBrute = Q(
    "ann_brute_topk",
    Some(bruteTopkDuck),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.bruteForceTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5)
        .orderBy(col("query_id"), col("rank"))
    })

  /** LSH-bucketed ANN (the 100 TB path) under the HARD oracle: the
    * engine's hyperplanes are MD5-derived Rademacher signs, so DuckDB
    * re-derives the identical planes with `md5()`, recomputes every
    * signature bit (±1·x products are exact; same summation order →
    * bit-identical dots), rebuilds the 16 width-4 band chunks, and
    * reproduces the banded candidate set exactly — candidates the
    * partial probe misses are missed identically on both sides, so
    * the output is hash-exact (closes the r7 `no_oracle` gap). */
  private val annLsh = Q(
    "ann_lsh_topk",
    Some(s"""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      $lshChunksDuck,
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      cands AS (SELECT DISTINCT qc.query_id, cc.vec_id AS c_id
                FROM (SELECT q.query_id, ch.chunk, ch.cval
                      FROM q JOIN chunks ch ON ch.vec_id = q.query_id) qc
                JOIN chunks cc ON cc.chunk = qc.chunk AND cc.cval = qc.cval
                WHERE cc.vec_id <> qc.query_id),
      scored AS (SELECT c.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(q.qv, e.v) AS sim
                 FROM cands c JOIN q ON q.query_id = c.query_id
                              JOIN e ON e.vec_id = c.c_id)
      SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
      FROM (SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored) z
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, bits = 64, bands = 16)
        .orderBy(col("query_id"), col("rank"))
    })

  /** IVF-bucketed ANN (the other scale path: inverted-file cells,
    * tunable nProbe) — the partial-probe path (nProbe=4 of 16) under
    * the HARD oracle: DuckDB independently re-derives the
    * deterministic centroid fit (16 lowest-id vectors), the
    * argmax-cosine cell assignment (tie → lowest cell index), the
    * 4-nearest-cell probe set per query, and the exact re-rank of the
    * probed cells' candidates — so cells MISSED by the partial probe
    * are missed identically on both sides and the output is
    * hash-exact, not merely recall-spec'd (closes the r7 `no_oracle`
    * gap). */
  private val annIvf = Q(
    "ann_ivf_topk",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      cent AS (SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cidx, v AS cv
               FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
      assign AS (
        SELECT vec_id, v, cidx AS cell
        FROM (SELECT e.vec_id, e.v, cent.cidx,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY list_cosine_similarity(e.v, cent.cv) DESC, cent.cidx) AS rn
              FROM e CROSS JOIN cent) x
        WHERE rn = 1),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      probes AS (
        SELECT query_id, cidx AS cell
        FROM (SELECT q.query_id, cent.cidx,
                     row_number() OVER (PARTITION BY q.query_id
                       ORDER BY list_cosine_similarity(q.qv, cent.cv) DESC, cent.cidx) AS rn
              FROM q CROSS JOIN cent) y
        WHERE rn <= 4),
      cands AS (
        SELECT q.query_id, a.vec_id AS neighbor_id,
               list_cosine_similarity(q.qv, a.v) AS sim
        FROM probes JOIN q USING (query_id)
                    JOIN assign a ON a.cell = probes.cell
        WHERE a.vec_id <> q.query_id)
      SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
      FROM (SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS rank
            FROM cands) z
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, nCells = 16, nProbe = 4)
        .orderBy(col("query_id"), col("rank"))
    })

  /** IVF at nProbe = nCells: every cell probed → exact top-k by
    * construction, so the brute-force oracle applies verbatim. Proves
    * the IVF plumbing (cell assignment, probe fan-out, re-rank) against
    * the hard oracle, not just the recall spec. */
  private val annIvfFull = Q(
    "ann_ivf_full",
    Some(bruteTopkDuck),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.ivfTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, nCells = 16, nProbe = 16)
        .orderBy(col("query_id"), col("rank"))
    })

  /** LSH at 1-bit bands (64 bands of width 1): a candidate is missed
    * only if it differs from the query in EVERY signature bit — on this
    * data no top-k neighbor does (asserted equal to brute force in
    * LlmOpsSpec), so the exact oracle applies. */
  private val annLshFull = Q(
    "ann_lsh_full",
    Some(bruteTopkDuck),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.lshTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, bits = 64, bands = 64)
        .orderBy(col("query_id"), col("rank"))
    })

  /** SQ8 scalar quantization of the embedding column (the 4× memory/IO
    * compression for 100 TB ANN) — full oracle: DuckDB re-derives the
    * per-dimension global min/max bounds and the identical affine
    * round((x-lo)*255/(hi-lo)) mapping; arrays serialized to strings
    * for the driver's hash compare. */
  private val sq8QuantizeQ = Q(
    "sq8_quantize",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, (SELECT max(len(v)) FROM e))) AS i),
      stats AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi FROM e CROSS JOIN dims GROUP BY i),
      bounds AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM stats)
      SELECT vec_id,
             array_to_string([CAST(CASE WHEN his[i] = los[i] THEN 0
                                        ELSE round((v[i] - los[i]) * 255.0 / (his[i] - los[i])) END AS INT)
                              FOR i IN generate_series(1, len(v))], ',') AS q
      FROM e CROSS JOIN bounds
      ORDER BY vec_id"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (los, his) = Similarity.sq8Bounds(emb, "embedding")
      emb.select(col("vec_id"),
          concat_ws(",", Similarity.sq8Quantize(col("embedding"), los, his)
            .cast("array<string>")).as("q"))
        .orderBy(col("vec_id"))
    })

  /** SQ8 ANN at full oversample: every candidate survives the approx
    * pass, the exact re-rank sees the whole corpus → exact top-k by
    * construction, so the brute-force oracle applies verbatim (proves
    * the quantize → approx-scan → fetch → re-rank plumbing). */
  private val annSq8Full = Q(
    "ann_sq8_full",
    Some(bruteTopkDuck),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.sq8TopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, oversample = 100)
        .orderBy(col("query_id"), col("rank"))
    })

  /** SQ8 ANN at practical oversample (the scale path) under the HARD
    * oracle: DuckDB re-derives the per-dimension bounds, the identical
    * quantize→dequantize round trip, the approximate top-20 candidate
    * cut (cosine against the dequantized corpus, ties → lowest id),
    * and the exact re-rank — candidates dropped by the approximate
    * pass drop identically on both sides, so the partial-probe output
    * is hash-exact (closes the r7 `no_oracle` gap). */
  private val annSq8 = Q(
    "ann_sq8_topk",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      dims AS (SELECT unnest(generate_series(1, (SELECT max(len(v)) FROM e))) AS i),
      stats AS (SELECT i, min(v[i]) AS lo, max(v[i]) AS hi FROM e CROSS JOIN dims GROUP BY i),
      bounds AS (SELECT list(lo ORDER BY i) AS los, list(hi ORDER BY i) AS his FROM stats),
      dq AS (SELECT vec_id,
                    [CASE WHEN his[i] = los[i] THEN los[i]
                          ELSE los[i] + CAST(round((v[i] - los[i]) * 255.0 / (his[i] - los[i])) AS INT)
                                        * (his[i] - los[i]) / 255.0 END
                     FOR i IN generate_series(1, len(v))] AS dqv
             FROM e CROSS JOIN bounds),
      q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < 5),
      approx AS (
        SELECT query_id, qv, dq.vec_id AS c_id,
               row_number() OVER (PARTITION BY query_id
                 ORDER BY list_cosine_similarity(qv, dqv) DESC, dq.vec_id) AS arank
        FROM q JOIN dq ON dq.vec_id <> q.query_id),
      cands AS (SELECT query_id, qv, c_id FROM approx WHERE arank <= 20),
      scored AS (SELECT query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(qv, e.v) AS sim
                 FROM cands JOIN e ON e.vec_id = cands.c_id)
      SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
      FROM (SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored) z
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.sq8TopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5, oversample = 4)
        .orderBy(col("query_id"), col("rank"))
    })

  /** PQ encoding with an init-only codebook, full oracle: DuckDB
    * independently re-derives the deterministic codebook (per-subspace
    * slices of the 16 lowest-id vectors) and the argmin-L2 assignment
    * (tie → lowest codeword id), so the subspace slicing, the distance
    * fold, and the 1-based code layout are all value-checked. The
    * Lloyd-refined fit (iters>0) shares every one of those kernels and
    * is covered by the `ann_pq_full` exactness row + the spec's
    * reconstruction-error test. */
  private val pqEncodeQ = Q(
    "pq_encode",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      seeds AS (SELECT row_number() OVER (ORDER BY vec_id) AS w, v
                FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
      s8 AS (SELECT unnest(generate_series(0, 7)) AS s),
      subs AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM e CROSS JOIN s8),
      words AS (SELECT w, s, v[s*8+1 : s*8+8] AS wv FROM seeds CROSS JOIN s8),
      dists AS (SELECT vec_id, subs.s AS s, w,
                       list_sum([(sv[i]-wv[i])*(sv[i]-wv[i])
                                 FOR i IN generate_series(1, 8)]) AS d
                FROM subs JOIN words ON subs.s = words.s),
      best AS (SELECT vec_id, s, w,
                      row_number() OVER (PARTITION BY vec_id, s
                                         ORDER BY d, w) AS rn
               FROM dists)
      SELECT vec_id,
             string_agg(CAST(w AS VARCHAR), ',' ORDER BY s) AS codes
      FROM best WHERE rn = 1
      GROUP BY vec_id
      ORDER BY vec_id"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val books = Similarity.pqFit(emb, "vec_id", "embedding", m = 8, ksub = 16, iters = 0)
      emb.select(col("vec_id"),
          concat_ws(",", Similarity.pqEncode(col("embedding"), books)
            .cast("array<string>")).as("codes"))
        .orderBy(col("vec_id"))
    })

  /** PQ ANN at full oversample: every candidate survives the approx
    * pass, the exact re-rank sees the whole corpus → exact top-k by
    * construction, so the brute-force oracle applies verbatim (proves
    * the fit → encode → decode-scan → fetch → re-rank plumbing,
    * Lloyd refinement included). */
  private val annPqFull = Q(
    "ann_pq_full",
    Some(bruteTopkDuck),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5,
          m = 8, ksub = 16, iters = 1, oversample = 100)
        .orderBy(col("query_id"), col("rank"))
    })

  /** PQ ANN at practical oversample (the 32×-compression scale path)
    * under the HARD oracle: DuckDB re-derives the full pipeline — the
    * deterministic codebook init, ONE unrolled Lloyd round (assign by
    * argmin-L2 with tie → lowest codeword, re-estimate codeword means,
    * empty codewords keep their init value), the re-encode against the
    * refined books, the ADC score (per-subspace dots summed in
    * subspace order, normalized by sqrt(q_n2·c_dqn2)), the top-20
    * candidate cut, and the exact re-rank — so candidates the
    * compressed scan drops are dropped identically on both sides and
    * the output is hash-exact (closes the r7 `no_oracle` gap). */
  private val annPq = Q(
    "ann_pq_topk",
    Some("""
      WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
      seeds AS (SELECT row_number() OVER (ORDER BY vec_id) AS w, v
                FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT 16)),
      s8 AS (SELECT unnest(generate_series(0, 7)) AS s),
      subs AS (SELECT vec_id, s, v[s*8+1 : s*8+8] AS sv FROM e CROSS JOIN s8),
      words0 AS (SELECT w, s, v[s*8+1 : s*8+8] AS wv FROM seeds CROSS JOIN s8),
      dists0 AS (SELECT vec_id, subs.s AS s, w,
                        list_sum([(sv[i]-wv[i])*(sv[i]-wv[i])
                                  FOR i IN generate_series(1, 8)]) AS d
                 FROM subs JOIN words0 ON subs.s = words0.s),
      best0 AS (SELECT vec_id, s, w FROM
                (SELECT vec_id, s, w,
                        row_number() OVER (PARTITION BY vec_id, s ORDER BY d, w) AS rn
                 FROM dists0) x0 WHERE rn = 1),
      means AS (SELECT b.s, b.w, p.p, avg(sub.sv[p.p]) AS mu
                FROM best0 b
                JOIN subs sub ON sub.vec_id = b.vec_id AND sub.s = b.s
                CROSS JOIN (SELECT unnest(generate_series(1, 8)) AS p) p
                GROUP BY b.s, b.w, p.p),
      refit AS (SELECT s, w, list(mu ORDER BY p) AS wv FROM means GROUP BY s, w),
      words1 AS (SELECT w0.s, w0.w, coalesce(r.wv, w0.wv) AS wv
                 FROM words0 w0 LEFT JOIN refit r ON r.s = w0.s AND r.w = w0.w),
      dists1 AS (SELECT vec_id, subs.s AS s, w,
                        list_sum([(sv[i]-wv[i])*(sv[i]-wv[i])
                                  FOR i IN generate_series(1, 8)]) AS d
                 FROM subs JOIN words1 ON subs.s = words1.s),
      best1 AS (SELECT vec_id, s, w FROM
                (SELECT vec_id, s, w,
                        row_number() OVER (PARTITION BY vec_id, s ORDER BY d, w) AS rn
                 FROM dists1) x1 WHERE rn = 1),
      norms AS (SELECT b.vec_id, b.s,
                       list_sum([w1.wv[i]*w1.wv[i] FOR i IN generate_series(1, 8)]) AS n2
                FROM best1 b JOIN words1 w1 ON w1.s = b.s AND w1.w = b.w),
      dqn2 AS (SELECT vec_id, list_sum(list(n2 ORDER BY s)) AS c_dqn2
               FROM norms GROUP BY vec_id),
      q AS (SELECT vec_id AS query_id, v AS qv,
                   list_sum([v[i]*v[i] FOR i IN generate_series(1, len(v))]) AS q_n2
            FROM e WHERE vec_id < 5),
      pd AS (SELECT q.query_id, b.vec_id AS c_id, b.s,
                    list_sum([q.qv[b.s*8+i] * w1.wv[i]
                              FOR i IN generate_series(1, 8)]) AS dot_s
             FROM q CROSS JOIN best1 b
             JOIN words1 w1 ON w1.s = b.s AND w1.w = b.w
             WHERE b.vec_id <> q.query_id),
      adc AS (SELECT query_id, c_id, list_sum(list(dot_s ORDER BY s)) AS adot
              FROM pd GROUP BY query_id, c_id),
      approx AS (SELECT adc.query_id, adc.c_id,
                        CASE WHEN sqrt(q.q_n2 * d.c_dqn2) = 0 THEN 0.0
                             ELSE adot / sqrt(q.q_n2 * d.c_dqn2) END AS asim
                 FROM adc JOIN q ON q.query_id = adc.query_id
                          JOIN dqn2 d ON d.vec_id = adc.c_id),
      cands AS (SELECT query_id, c_id FROM
                (SELECT query_id, c_id,
                        row_number() OVER (PARTITION BY query_id
                          ORDER BY asim DESC, c_id) AS arank
                 FROM approx) x2 WHERE arank <= 20),
      scored AS (SELECT c.query_id, e.vec_id AS neighbor_id,
                        list_cosine_similarity(q.qv, e.v) AS sim
                 FROM cands c JOIN q ON q.query_id = c.query_id
                              JOIN e ON e.vec_id = c.c_id)
      SELECT query_id, rank, neighbor_id, round(sim, 6) AS cos_sim
      FROM (SELECT query_id, neighbor_id, sim,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, neighbor_id) AS rank
            FROM scored) z
      WHERE rank <= 5
      ORDER BY query_id, rank"""),
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      Similarity.pqTopK(
          emb.select(col("vec_id"), col("embedding")),
          emb.filter(col("vec_id") < 5).select(col("vec_id").as("query_id"),
            col("embedding").as("qv")),
          corpusId = "vec_id", corpusVec = "embedding",
          queryId = "query_id", queryVec = "qv", k = 5,
          m = 8, ksub = 16, iters = 1, oversample = 4)
        .orderBy(col("query_id"), col("rank"))
    })

  /** Language ID distribution (stopword-hit argmax heuristic). */
  private val textLangid = Q(
    "text_langid",
    Some("""
      WITH scored AS (
        SELECT doc_id,
               len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                                  ['the','a','of','and','to','in','is'])) AS s_en,
               len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                                  ['der','die','das','und','ist','ein'])) AS s_de,
               len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                                  ['le','la','les','et','est','un'])) AS s_fr,
               len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                                  ['el','los','las','y','es','un'])) AS s_es,
               len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                                  ['的','是','在','了','和'])) AS s_zh
        FROM documents)
      SELECT CASE
               WHEN s_en = 0 AND s_de = 0 AND s_fr = 0 AND s_es = 0 AND s_zh = 0 THEN 'und'
               WHEN s_en >= s_de AND s_en >= s_fr AND s_en >= s_es AND s_en >= s_zh THEN 'en'
               WHEN s_de >= s_fr AND s_de >= s_es AND s_de >= s_zh THEN 'de'
               WHEN s_fr >= s_es AND s_fr >= s_zh THEN 'fr'
               WHEN s_es >= s_zh THEN 'es'
               ELSE 'zh' END AS lang_pred,
             count(*) AS n
      FROM scored GROUP BY 1 ORDER BY lang_pred"""),
    (s, dir) =>
      t(s, dir, "documents")
        .select(TextAnalysis.langId(col("text")).as("lang_pred"))
        .groupBy(col("lang_pred")).agg(count(lit(1)).as("n"))
        .orderBy(col("lang_pred")))

  /** Quality scoring components + composite. */
  private val textQuality = Q(
    "text_quality",
    Some("""
      SELECT doc_id,
             round(least(length(text) / 500.0, 1.0) * 0.3
                   + (CASE WHEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                            / greatest(length(text), 1)::DOUBLE <= 0.1 THEN 1.0
                           ELSE greatest(0.0, 1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                                / greatest(length(text), 1)::DOUBLE * 5) END) * 0.2
                   + least(len(list_filter(string_split_regex(text, '\s+'),
                               t -> list_contains(['the','a','of','and','to','in','is','der','die','das','und','ist','ein','le','la','les','et','est','un','el','los','las','y','es','的','是','在','了','和'], t)))
                           / greatest(len(string_split_regex(text, '\s+')), 1)::DOUBLE * 5, 1.0) * 0.2
                   + (CASE WHEN (length(text) - len(string_split_regex(text, '\s+')) + 1)
                                / greatest(len(string_split_regex(text, '\s+')), 1)::DOUBLE
                                BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3, 4) AS quality
      FROM documents WHERE doc_id < 40 ORDER BY doc_id"""),
    (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"), TextAnalysis.qualityScore(col("text")).as("quality"))
        .orderBy(col("doc_id")))

  /** Token counting: whitespace + BPE-ish pre-tokenizer regex. */
  /** Overlapping character-window chunking (RAG/embedding
    * preprocessing — TextAnalysis.chunk): windows of 120 chars every
    * 90 (30-char overlap), trailing windows that fit inside the
    * previous overlap suppressed. DuckDB re-derives the identical
    * window set from range()+substr, chunk identity being (doc,
    * offset) — layout-independent by construction. */
  private val textChunks = Q(
    "text_chunks",
    Some("""
      SELECT doc_id,
             CAST(chunk_start / 90 AS BIGINT) AS chunk_idx,
             CAST(chunk_start AS BIGINT) AS chunk_start,
             substr(text, chunk_start + 1, 120) AS chunk,
             length(substr(text, chunk_start + 1, 120)) AS n_chunk_chars
      FROM (SELECT doc_id, text, unnest(range(0, greatest(length(text), 1), 90)) AS chunk_start
            FROM documents WHERE doc_id < 60)
      WHERE (chunk_start = 0 OR length(text) - chunk_start > 30)
        AND length(substr(text, chunk_start + 1, 120)) > 0
      ORDER BY doc_id, chunk_idx"""),
    (s, dir) =>
      TextAnalysis.chunk(
        t(s, dir, "documents").filter(col("doc_id") < 60),
        col("doc_id"), col("text"), chunkChars = 120, overlap = 30)
        .orderBy(col("doc_id"), col("chunk_idx")))

  private val textTokens = Q(
    "text_tokens",
    Some("""
      SELECT doc_id,
             len(string_split_regex(text, '\s+')) AS n_ws_tokens,
             len(regexp_extract_all(text, '[a-zA-Z0-9_]+|[^a-zA-Z0-9_\s]')) AS n_bpeish,
             n_chars
      FROM documents WHERE doc_id < 40 ORDER BY doc_id"""),
    (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"),
          TextAnalysis.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
          TextAnalysis.bpeishTokenCount(col("text")).cast("long").as("n_bpeish"),
          col("n_chars"))
        .orderBy(col("doc_id")))

  /** Corpus-fit unigram LM score (CCNet-style quality filter). Oracle:
    * DuckDB rebuilds the same top-K unigram log10-prob map and replays
    * the identical left-fold over each doc's tokens, so the double
    * arithmetic order matches term for term (agreement at 4 decimals —
    * log10 itself may differ in the last ulp across libms). */
  private val textLmScore = Q(
    "text_lm_score",
    Some("""
      WITH toks AS (SELECT unnest(string_split(text, ' ')) AS tok FROM documents),
      counts AS (SELECT tok, count(*) AS c FROM toks GROUP BY tok ORDER BY c DESC, tok LIMIT 50000),
      tot AS (SELECT CAST(sum(c) AS DOUBLE) AS total FROM counts),
      m AS (SELECT map_from_entries(list(struct_pack(k := tok, v := log10(c / total)))) AS pm
            FROM counts, tot)
      SELECT doc_id,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                     [CAST(coalesce(map_extract(pm, t)[1], -10.0) AS DOUBLE)
                      FOR t IN string_split(text, ' ')]),
                   (acc, x) -> acc + x) / len(string_split(text, ' ')), 4) AS lm_score
      FROM documents CROSS JOIN m ORDER BY doc_id"""),
    (s, dir) =>
      TextAnalysis.unigramLmScore(t(s, dir, "documents"), col("doc_id"), col("text"))
        .orderBy(col("doc_id")))

  /** Character entropy (bits/char) — row-local fold in sorted char
    * order, so the double summation order (and thus the hash) is
    * engine-independent; log2 = ln/ln(2) mirrored on both sides. */
  private val textEntropy = Q(
    "text_entropy",
    Some("""
      WITH cs AS (SELECT doc_id, [text[i] FOR i IN generate_series(1, len(text))] AS c,
                         len(text) AS n
                  FROM documents)
      SELECT doc_id,
             round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               [ -(CAST(len(list_filter(c, x -> x = ch)) AS DOUBLE) / n)
                  * (ln(CAST(len(list_filter(c, x -> x = ch)) AS DOUBLE) / n) / ln(2.0))
                 FOR ch IN list_sort(list_distinct(c)) ]),
               (a, x) -> a + x), 6) AS char_entropy
      FROM cs ORDER BY doc_id"""),
    (s, dir) =>
      t(s, dir, "documents")
        .select(col("doc_id"), TextAnalysis.charEntropy(col("text")).as("char_entropy"))
        .orderBy(col("doc_id")))

  /** Composed per-doc quality GATE — the filter pipeline a corpus team
    * actually runs: language check, then heuristic quality floor, then
    * repetition ceiling; first failing check names the drop reason.
    * Pure projection (zero shuffle); every signal reuses an
    * oracle-verified kernel, and the gate itself is re-derived in
    * DuckDB from the same snippets. */
  private val textQualityGate = Q(
    "text_quality_gate",
    Some(s"""
      WITH sig AS (SELECT doc_id, $qualityDuck AS quality, $langidDuck AS lang_pred,
                          string_split(text, ' ') AS ts
                   FROM documents),
      r AS (SELECT doc_id, quality, lang_pred,
                   CASE WHEN len(ts) >= 2
                        THEN round(1.0 - CAST(len(list_distinct(
                               list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
                               AS DOUBLE) / (len(ts) - 1), 6)
                        ELSE 0.0 END AS dup_2gram_frac
            FROM sig),
      g AS (SELECT doc_id, lang_pred, quality, dup_2gram_frac,
                   CASE WHEN lang_pred <> 'en' THEN 'lang'
                        WHEN quality < 0.5 THEN 'quality'
                        WHEN dup_2gram_frac > 0.02 THEN 'repetition'
                        ELSE 'ok' END AS reason
            FROM r)
      SELECT doc_id, lang_pred, quality, dup_2gram_frac, reason,
             reason = 'ok' AS keep
      FROM g ORDER BY doc_id"""),
    (s, dir) => {
      val base = t(s, dir, "documents").select(col("doc_id"),
        TextAnalysis.langId(col("text")).as("lang_pred"),
        TextAnalysis.qualityScore(col("text")).as("quality"),
        TextAnalysis.repetitionStats(col("doc_id"), col("text"))(3))
      base
        .withColumn("reason",
          when(col("lang_pred") =!= "en", "lang")
            .when(col("quality") < 0.5, "quality")
            .when(col("dup_2gram_frac") > 0.02, "repetition")
            .otherwise("ok"))
        .withColumn("keep", col("reason") === "ok")
        .orderBy(col("doc_id"))
    })

  /** Gopher-style repetition quality signals; every count is integer
    * and row-local, so DuckDB recomputes each fraction bit-exactly
    * (same op order: 1.0 - cast/len, round 6). */
  private val textRepetition = Q(
    "text_repetition",
    Some("""
      WITH d AS (SELECT doc_id, string_split(text, ' ') AS ts FROM documents),
      tok AS (SELECT doc_id, unnest(ts) AS tok FROM d),
      cnt AS (SELECT doc_id, tok, count(*) AS c FROM tok GROUP BY doc_id, tok),
      top AS (SELECT doc_id, max(c) AS topc FROM cnt GROUP BY doc_id)
      SELECT d.doc_id,
             round(1.0 - CAST(len(list_distinct(ts)) AS DOUBLE) / len(ts), 6) AS dup_word_frac,
             round(CAST(top.topc AS DOUBLE) / len(ts), 6) AS top_word_frac,
             CASE WHEN len(ts) >= 2
                  THEN round(1.0 - CAST(len(list_distinct(
                         list_transform(range(1, len(ts)), i -> ts[i] || ' ' || ts[i+1])))
                         AS DOUBLE) / (len(ts) - 1), 6)
                  ELSE 0.0 END AS dup_2gram_frac
      FROM d JOIN top USING (doc_id) ORDER BY doc_id"""),
    (s, dir) =>
      t(s, dir, "documents")
        .select(TextAnalysis.repetitionStats(col("doc_id"), col("text")): _*)
        .orderBy(col("doc_id")))

  /** Fingerprints: normalized-md5 (oracle) + rolling hash (list_reduce
    * reconstruction in DuckDB). */
  private val textFingerprint = Q(
    "text_fingerprint",
    Some("""
      SELECT doc_id,
             md5(trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                                     '\s+', ' ', 'g'))) AS fp,
             list_reduce(list_prepend(CAST(0 AS BIGINT),
                                      [CAST(unicode(c) AS BIGINT) FOR c IN string_split(text, '')]),
                         (h, c) -> (h * 31 + c) % 1000000007) AS rolling_fp
      FROM documents WHERE doc_id < 40 ORDER BY doc_id"""),
    (s, dir) =>
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"),
          TextAnalysis.fingerprint(col("text")).as("fp"),
          TextAnalysis.rollingFingerprint(col("text")).as("rolling_fp"))
        .orderBy(col("doc_id")))

  /** Multimodal frame fan-out: binary slicing + meta arithmetic (oracle
    * recomputes the arithmetic from n_chars without touching bytes). */
  private val multimodalFrames = Q(
    "multimodal_frames",
    Some("""
      WITH m AS (SELECT doc_id AS media_id, n_chars,
                        n_chars % 5 + 1 AS n_frames,
                        greatest(n_chars // (n_chars % 5 + 1), 1) AS frame_len
                 FROM documents),
           f AS (SELECT media_id, n_chars, frame_len, unnest(generate_series(0, n_frames - 1)) AS frame_idx
                 FROM m)
      SELECT media_id, CAST(frame_idx AS INT) AS frame_idx,
             CAST(least(frame_len, n_chars - frame_idx * frame_len) AS BIGINT) AS frame_n_bytes
      FROM f WHERE media_id < 40
      ORDER BY media_id, frame_idx"""),
    (s, dir) => {
      val media = Multimodal.packDocsAsMedia(t(s, dir, "documents").filter(col("doc_id") < 40))
      Multimodal.frameSample(media)
        .select(col("media_id"), col("frame_idx"),
          col("frame_n_bytes").cast("long").as("frame_n_bytes"))
        .orderBy(col("media_id"), col("frame_idx"))
    })

  /** Multimodal decode + feature extraction (STUB kernels, real
    * plumbing) — full oracle: decode is a pure projection now
    * (octet_length + Fnv1a64), so DuckDB recomputes every output from
    * the same text bytes, including the FNV-1a content hash (hex-nibble
    * list_reduce) and histogram bin 0 (bytes < 16 over total). */
  private val multimodalDecode = Q(
    "multimodal_decode",
    Some("""
      WITH m AS (SELECT doc_id AS media_id, text, n_chars,
                        (['image','audio','video'])[CAST(doc_id % 3 + 1 AS INT)] AS kind,
                        CAST(least(n_chars % 640 + 16, 512) AS INT) AS width,
                        CAST(least(n_chars % 480 + 16, 384) AS INT) AS height
                 FROM documents WHERE doc_id < 40),
      hx AS (SELECT media_id, kind, width, height, string_split(hex(encode(text)), '') AS h FROM m),
      bs AS (SELECT media_id, kind, width, height,
                    [ (strpos('0123456789ABCDEF', h[2*i-1])-1)*16 + (strpos('0123456789ABCDEF', h[2*i])-1)
                      FOR i IN generate_series(1, len(h)//2) ] AS b FROM hx)
      SELECT media_id, CAST(len(b) AS BIGINT) AS n_bytes,
             CAST(CASE WHEN f >= 9223372036854775808::HUGEINT THEN f - 18446744073709551616::HUGEINT ELSE f END AS BIGINT) AS content_hash,
             kind, width, height,
             round(CAST(len(list_filter(b, x -> x < 16)) AS DOUBLE) / len(b), 6) AS feat_0
      FROM (SELECT media_id, kind, width, height, b,
                   list_reduce(list_prepend(14695981039346656037::HUGEINT, b),
                     (a, x) -> (xor(a, x::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS f
            FROM bs) y
      ORDER BY media_id"""),
    (s, dir) => {
      val media = Multimodal.packDocsAsMedia(t(s, dir, "documents").filter(col("doc_id") < 40))
      val decoded = Multimodal.decodeStub(s, media)
      Multimodal.extractFeatures(Multimodal.resizeStub(decoded, 512, 384))
        .select(col("media_id"), col("n_bytes").cast("long").as("n_bytes"),
          col("content_hash"),
          col("meta.kind").as("kind"), col("meta.width").as("width"),
          col("meta.height").as("height"),
          round(element_at(col("features"), 1).cast("double"), 6).as("feat_0"))
        .orderBy(col("media_id"))
    })

  private lazy val qualityDuck = """
      round(least(length(text) / 500.0, 1.0) * 0.3
            + (CASE WHEN length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                     / greatest(length(text), 1)::DOUBLE <= 0.1 THEN 1.0
                    ELSE greatest(0.0, 1.0 - length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
                         / greatest(length(text), 1)::DOUBLE * 5) END) * 0.2
            + least(len(list_filter(string_split_regex(text, '\s+'),
                        t -> list_contains(['the','a','of','and','to','in','is','der','die','das','und','ist','ein','le','la','les','et','est','un','el','los','las','y','es','的','是','在','了','和'], t)))
                    / greatest(len(string_split_regex(text, '\s+')), 1)::DOUBLE * 5, 1.0) * 0.2
            + (CASE WHEN (length(text) - len(string_split_regex(text, '\s+')) + 1)
                         / greatest(len(string_split_regex(text, '\s+')), 1)::DOUBLE
                         BETWEEN 3.0 AND 10.0 THEN 1.0 ELSE 0.5 END) * 0.3, 4)"""

  private lazy val langidDuck = """
      CASE WHEN len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['the','a','of','and','to','in','is'])) = 0
            AND len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['der','die','das','und','ist','ein'])) = 0
            AND len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['le','la','les','et','est','un'])) = 0
            AND len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['el','los','las','y','es','un'])) = 0
            AND len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['的','是','在','了','和'])) = 0 THEN 'und'
           WHEN len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                   ['the','a','of','and','to','in','is']))
             >= greatest(
                  len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                     ['der','die','das','und','ist','ein'])),
                  len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                     ['le','la','les','et','est','un'])),
                  len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                     ['el','los','las','y','es','un'])),
                  len(list_intersect(list_distinct(string_split_regex(lower(text), '\s+')),
                     ['的','是','在','了','和']))) THEN 'en'
           ELSE 'other' END"""

  /** Shared DuckDB CTE: per-document FNV-1a64 (signed) — the same
    * reconstruction the multimodal/simhash oracles use. */
  private val fnvDocsCte = """
      WITH hx AS (SELECT doc_id, n_chars, source, string_split(hex(encode(text)), '') AS h FROM documents),
      fh AS (SELECT doc_id, n_chars, source,
               CAST(CASE WHEN f >= 9223372036854775808::HUGEINT THEN f - 18446744073709551616::HUGEINT ELSE f END AS BIGINT) AS fnv
             FROM (SELECT doc_id, n_chars, source,
                     list_reduce(list_prepend(14695981039346656037::HUGEINT,
                       [ (strpos('0123456789ABCDEF', h[2*i-1])-1)*16 + (strpos('0123456789ABCDEF', h[2*i])-1)
                         FOR i IN generate_series(1, len(h)//2) ]),
                       (a, x) -> (xor(a, x::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS f
                   FROM hx) y)"""

  /** Deterministic hash sampling — reproducible across runs/clusters
    * (content-hash bucket, not RNG). */
  private val dataSampleHash = Q(
    "data_sample_hash",
    Some(s"""
      $fnvDocsCte
      SELECT doc_id, n_chars FROM fh
      WHERE ((fnv % 100) + 100) % 100 < 20
      ORDER BY doc_id"""),
    (s, dir) =>
      graft.operators.Curation.hashSample(t(s, dir, "documents"), col("text"), 20)
        .select(col("doc_id"), col("n_chars"))
        .orderBy(col("doc_id")))

  /** Sink-side shard manifest: deterministic content-hash sharding +
    * per-shard counts and an order-independent XOR checksum (DuckDB
    * bit_xor over the same FNV values — XOR commutes, so both engines
    * agree under any partitioning). */
  private val dataShards = Q(
    "data_shards",
    Some(s"""
      $fnvDocsCte
      SELECT ((fnv % 8) + 8) % 8 AS shard, count(*) AS n_docs,
             CAST(sum(n_chars) AS BIGINT) AS n_tokens,
             bit_xor(fnv) AS checksum,
             min(doc_id) AS min_id, max(doc_id) AS max_id
      FROM fh GROUP BY 1 ORDER BY shard"""),
    (s, dir) =>
      graft.operators.Curation.shardManifest(t(s, dir, "documents"),
          col("doc_id"), col("text"), col("n_chars"), nShards = 8)
        .orderBy(col("shard")))

  /** Deterministic stratified sampling: smallest-hash n per stratum. */
  private val dataSampleStratified = Q(
    "data_sample_stratified",
    Some(s"""
      $fnvDocsCte
      SELECT doc_id, doc_id % 5 AS stratum
      FROM (SELECT doc_id, row_number() OVER (PARTITION BY doc_id % 5 ORDER BY fnv, doc_id) AS rk
            FROM fh) x
      WHERE rk <= 5
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents").withColumn("stratum", pmod(col("doc_id"), lit(5)))
      graft.operators.Curation.stratifiedSample(docs, col("stratum"), col("text"), 5,
          tieBreak = Some(col("doc_id")))
        .select(col("doc_id"), col("stratum"))
        .orderBy(col("doc_id"))
    })

  /** GPT-style token-stream packing: per-shard cumulative token count →
    * fixed 512-token block ranges. */
  private val dataPackBlocks = Q(
    "data_pack_blocks",
    Some("""
      WITH d AS (SELECT doc_id, doc_id % 4 AS shard,
                        CAST(len(string_split_regex(text, '\s+')) AS BIGINT) AS n_tokens
                 FROM documents),
      c AS (SELECT doc_id, shard, n_tokens,
                   -- CAST: DuckDB windowed sum() is HUGEINT, which pandas
                   -- renders as float64 and breaks the driver's value hash.
                   CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id) AS BIGINT) AS cum FROM d)
      SELECT doc_id, shard, n_tokens,
             (cum - n_tokens) // 512 AS start_block,
             (cum - 1) // 512 AS end_block
      FROM c ORDER BY doc_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .withColumn("shard", pmod(col("doc_id"), lit(4)))
        .withColumn("n_tokens", graft.operators.TextAnalysis.tokenCount(col("text")).cast("long"))
      graft.operators.Curation.packBlocks(docs, col("shard"), col("doc_id"),
          col("n_tokens"), 512)
        .select(col("doc_id"), col("shard"), col("n_tokens"),
          col("start_block"), col("end_block"))
        .orderBy(col("doc_id"))
    })

  /** Deterministic source-mixture sampling (the training "data recipe"):
    * src0 oversampled 2.5 epochs, src1 downsampled to 40%, src2 dropped,
    * everything else 1 epoch. Full oracle: DuckDB re-derives the same
    * FNV content hash and epoch arithmetic. */
  private val dataMixture = Q(
    "data_mixture",
    Some(s"""
      $fnvDocsCte,
      w AS (SELECT doc_id, source, fnv,
              CASE source WHEN 'src0' THEN 2.5 WHEN 'src1' THEN 0.4
                          WHEN 'src2' THEN 0.0 ELSE 1.0 END AS epochs
            FROM fh),
      c AS (SELECT doc_id, source, fnv, epochs,
              unnest(generate_series(0, CAST(floor(epochs) AS INT))) AS copy_idx
            FROM w)
      SELECT doc_id, source, CAST(copy_idx AS INT) AS copy_idx
      FROM c
      WHERE copy_idx < floor(epochs)
         OR ((fnv % 100) + 100) % 100 < round((epochs - floor(epochs)) * 100)
      ORDER BY doc_id, copy_idx"""),
    (s, dir) =>
      graft.operators.Curation.mixture(t(s, dir, "documents"),
          col("source"), col("text"),
          Map("src0" -> 2.5, "src1" -> 0.4, "src2" -> 0.0), defaultEpochs = 1.0)
        .select(col("doc_id"), col("source"), col("copy_idx"))
        .orderBy(col("doc_id"), col("copy_idx")))

  /** Deterministic 80/10/10 train/validation/test split (content-hash
    * buckets — stable under corpus growth). Full oracle via the shared
    * FNV CTE. */
  private val dataSplit = Q(
    "data_split",
    Some(s"""
      $fnvDocsCte
      SELECT doc_id,
             CASE WHEN ((fnv % 100) + 100) % 100 < 80 THEN 'train'
                  WHEN ((fnv % 100) + 100) % 100 < 90 THEN 'validation'
                  ELSE 'test' END AS split
      FROM fh ORDER BY doc_id"""),
    (s, dir) =>
      graft.operators.Curation.assignSplit(t(s, dir, "documents"), col("text"), 80, 10)
        .select(col("doc_id"), col("split"))
        .orderBy(col("doc_id")))

  /** Deterministic seeded training order over 8 shards — DuckDB
    * re-derives the seed-salted FNV hash and the per-shard rank. */
  private val dataShuffle = Q(
    "data_shuffle",
    Some("""
      WITH hx AS (SELECT doc_id, text, string_split(hex(encode('s42:' || text)), '') AS h FROM documents),
      fh AS (SELECT doc_id, text,
               CAST(CASE WHEN f >= 9223372036854775808::HUGEINT THEN f - 18446744073709551616::HUGEINT ELSE f END AS BIGINT) AS fnv
             FROM (SELECT doc_id, text,
                     list_reduce(list_prepend(14695981039346656037::HUGEINT,
                       [ (strpos('0123456789ABCDEF', h[2*i-1])-1)*16 + (strpos('0123456789ABCDEF', h[2*i])-1)
                         FOR i IN generate_series(1, len(h)//2) ]),
                       (a, x) -> (xor(a, x::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS f
                   FROM hx) y)
      SELECT doc_id, ((fnv % 8) + 8) % 8 AS shard,
             CAST(row_number() OVER (PARTITION BY ((fnv % 8) + 8) % 8
                                     ORDER BY fnv, doc_id) AS INT) AS ord
      FROM fh ORDER BY doc_id"""),
    (s, dir) =>
      graft.operators.Curation.shuffleOrder(t(s, dir, "documents"), col("text"),
          seed = "s42:", shards = 8, tieBreak = Some(col("doc_id")))
        .select(col("doc_id"), col("shard"), col("ord"))
        .orderBy(col("doc_id")))

  /** Benchmark decontamination: every 50th doc plays the benchmark set;
    * training docs whose 3-gram CONTAINMENT of any benchmark doc
    * reaches 0.5 are dropped (|train ∩ bench| / |bench| — the leakage
    * metric; one planted near-dup pair spans the split at containment
    * 1.0, the next-highest pair sits at 0.09). Full oracle. */
  private val dataDecontaminate = Q(
    "data_decontaminate",
    Some("""
      WITH g AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                               FOR i IN generate_series(1, len(w) - 2)]) AS sh
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents)),
      b AS (SELECT doc_id AS bench_id, sh AS bsh FROM g WHERE doc_id % 50 = 0),
      t AS (SELECT doc_id AS train_id, sh AS tsh FROM g WHERE doc_id % 50 <> 0),
      bad AS (SELECT DISTINCT train_id FROM t CROSS JOIN b
              WHERE len(list_intersect(tsh, bsh))::DOUBLE / len(bsh) >= 0.5)
      SELECT train_id AS doc_id FROM t
      WHERE train_id NOT IN (SELECT train_id FROM bad)
      ORDER BY doc_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
      val bench = docs.filter(pmod(col("doc_id"), lit(50)) === 0)
      val train = docs.filter(pmod(col("doc_id"), lit(50)) =!= 0)
      Dedup.decontaminate(train, bench, col("doc_id"), col("text"),
          n = 3, threshold = 0.5)
        .select(col("doc_id"))
        .orderBy(col("doc_id"))
    })

  /** Decontamination observability (r4 advisory): the shingles the
    * maxBucket skew guard would drop, with document frequencies — the
    * report a release pipeline logs so containment recall loss is
    * visible, not silent. Cap of 3 (vs the 10000 default) so the
    * testdata actually exercises the over-cap branch. */
  private val dataHotShingles = Q(
    "data_hot_shingles",
    Some("""
      WITH g AS (SELECT doc_id,
                        unnest(list_distinct([w[i] || ' ' || w[i+1]
                                              FOR i IN generate_series(1, len(w) - 1)])) AS shingle
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      SELECT shingle, count(*) AS df_count
      FROM g GROUP BY shingle HAVING count(*) > 3
      ORDER BY shingle"""),
    (s, dir) =>
      Dedup.hotShingles(t(s, dir, "documents"), col("doc_id"), col("text"),
          n = 2, maxBucket = 3)
        .orderBy(col("shingle")))

  /** Top-k n-gram vocabulary (document frequency, deterministic
    * tiebreak) — two-phase agg + TakeOrderedAndProject. */
  private val dataVocabTopk = Q(
    "data_vocab_topk",
    Some("""
      WITH g AS (SELECT doc_id,
                        unnest(list_distinct([w[i] || ' ' || w[i+1]
                                              FOR i IN generate_series(1, len(w) - 1)])) AS ngram
                 FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      SELECT ngram, count(*) AS cnt
      FROM g GROUP BY ngram
      ORDER BY cnt DESC, ngram LIMIT 20"""),
    (s, dir) =>
      graft.operators.Curation.vocabTopK(t(s, dir, "documents"), col("text"), 2, 20))

  /** Column profiling over documents: one row per column of
    * count/nulls/distinct/min/max, the ANALYZE-style pre-ingest pass. */
  private val dataProfile = Q(
    "data_profile",
    Some("""
      SELECT 'doc_id' AS col_name, count(doc_id) AS n,
             -- CAST: DuckDB sum() is HUGEINT → float64 in pandas → hash drift.
             CAST(sum(CASE WHEN doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls,
             count(DISTINCT doc_id) AS n_distinct,
             CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
      FROM documents
      UNION ALL
      SELECT 'lang', count(lang), CAST(sum(CASE WHEN lang IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT lang), CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'source', count(source), CAST(sum(CASE WHEN source IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT source), CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR)
      FROM documents
      UNION ALL
      SELECT 'n_chars', count(n_chars), CAST(sum(CASE WHEN n_chars IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             count(DISTINCT n_chars), CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR)
      FROM documents
      ORDER BY col_name"""),
    (s, dir) =>
      graft.operators.Curation.profile(t(s, dir, "documents"),
          Seq("doc_id", "lang", "source", "n_chars"))
        .orderBy(col("col_name")))

  /** PII scrubbing over text with planted emails/phones (the documents
    * table has none, so the query synthesizes a contact line per doc —
    * the redaction itself is what's under oracle). */
  private val dataRedact = Q(
    "data_redact",
    Some("""
      WITH d AS (SELECT doc_id,
                        concat(substr(text, 1, 40), ' contact u', CAST(doc_id AS VARCHAR),
                               '@example.com or +1 (555) 010-', CAST(doc_id AS VARCHAR),
                               ' ref 9900110022', CAST(doc_id AS VARCHAR)) AS t
                 FROM documents WHERE doc_id < 40)
      SELECT doc_id,
             regexp_replace(regexp_replace(regexp_replace(t,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
               '\+?[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g'),
               '[0-9]{6,}', '<NUM>', 'g') AS clean
      FROM d ORDER BY doc_id"""),
    (s, dir) => {
      val synth = concat(substring(col("text"), 1, 40),
        lit(" contact u"), col("doc_id").cast("string"),
        lit("@example.com or +1 (555) 010-"), col("doc_id").cast("string"),
        lit(" ref 9900110022"), col("doc_id").cast("string"))
      t(s, dir, "documents").filter(col("doc_id") < 40)
        .select(col("doc_id"),
          graft.operators.Curation.redact(synth).as("clean"))
        .orderBy(col("doc_id"))
    })

  /** The composed curation pipeline (operators.Pipeline): quality gate →
    * language gate → canonical exact dedup → near-dedup. Full oracle:
    * every stage is replicated in DuckDB SQL over the same data.
    * (langid collapses non-en to 'other' in the oracle — the pipeline
    * only distinguishes en vs not-en.) */
  private val llmPipeline = Q(
    "llm_pipeline",
    Some(s"""
      WITH scored AS (
        SELECT doc_id, text, $qualityDuck AS quality, $langidDuck AS lang_pred,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        FROM documents),
      gated AS (SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'),
      keepers AS (
        SELECT doc_id, quality, n_tokens, text FROM (
          SELECT g.*, min(doc_id) OVER (PARTITION BY
            md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))) AS keep_id
          FROM gated g) x WHERE doc_id = keep_id),
      g2 AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           FOR i IN generate_series(1, len(w) - 2)]) AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM keepers)),
      drops AS (SELECT DISTINCT b.doc_id AS drop_id
                FROM g2 a JOIN g2 b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5)
      SELECT doc_id, quality, n_tokens FROM keepers
      WHERE doc_id NOT IN (SELECT drop_id FROM drops)
      ORDER BY doc_id"""),
    (s, dir) =>
      graft.operators.Pipeline.curate(t(s, dir, "documents"))
        .orderBy(col("doc_id")))

  /** The full RELEASE pipeline (capstone composition): curate (quality →
    * language → exact dedup → near-dedup) → benchmark decontamination →
    * deterministic split, every stage replicated in DuckDB SQL over the
    * same data. Benchmark set = every 50th doc (excluded from the
    * training corpus, as in `data_decontaminate`). */
  private val llmRelease = Q(
    "llm_release",
    Some(s"""
      WITH scored AS (
        SELECT doc_id, text, $qualityDuck AS quality, $langidDuck AS lang_pred,
               CAST(len(string_split_regex(text, '\\s+')) AS BIGINT) AS n_tokens
        FROM documents WHERE doc_id % 50 <> 0),
      gated AS (SELECT * FROM scored WHERE quality >= 0.5 AND lang_pred = 'en'),
      keepers AS (
        SELECT doc_id, quality, n_tokens, text FROM (
          SELECT g.*, min(doc_id) OVER (PARTITION BY
            md5(array_to_string(list_sort(list_distinct(string_split(text, ' '))), ' '))) AS keep_id
          FROM gated g) x WHERE doc_id = keep_id),
      g2 AS (SELECT doc_id, list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                           FOR i IN generate_series(1, len(w) - 2)]) AS sh
             FROM (SELECT doc_id, string_split(text, ' ') AS w FROM keepers)),
      drops AS (SELECT DISTINCT b.doc_id AS drop_id
                FROM g2 a JOIN g2 b ON a.doc_id < b.doc_id
                WHERE len(list_intersect(a.sh, b.sh))::DOUBLE
                      / len(list_distinct(list_concat(a.sh, b.sh))) >= 0.5),
      surv AS (SELECT * FROM keepers WHERE doc_id NOT IN (SELECT drop_id FROM drops)),
      bsh AS (SELECT doc_id AS bench_id,
                     list_distinct([w[i] || ' ' || w[i+1] || ' ' || w[i+2]
                                    FOR i IN generate_series(1, len(w) - 2)]) AS sh
              FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents WHERE doc_id % 50 = 0)),
      ssh AS (SELECT s.doc_id, g2.sh FROM surv s JOIN g2 ON s.doc_id = g2.doc_id),
      bad AS (SELECT DISTINCT s.doc_id FROM ssh s CROSS JOIN bsh b
              WHERE len(list_intersect(s.sh, b.sh))::DOUBLE / len(b.sh) >= 0.5),
      clean AS (SELECT * FROM surv WHERE doc_id NOT IN (SELECT doc_id FROM bad)),
      hx2 AS (SELECT doc_id, quality, n_tokens, string_split(hex(encode(text)), '') AS h FROM clean),
      fh2 AS (SELECT doc_id, quality, n_tokens,
               CAST(CASE WHEN f >= 9223372036854775808::HUGEINT THEN f - 18446744073709551616::HUGEINT ELSE f END AS BIGINT) AS fnv
             FROM (SELECT doc_id, quality, n_tokens,
                     list_reduce(list_prepend(14695981039346656037::HUGEINT,
                       [ (strpos('0123456789ABCDEF', h[2*i-1])-1)*16 + (strpos('0123456789ABCDEF', h[2*i])-1)
                         FOR i IN generate_series(1, len(h)//2) ]),
                       (a, x) -> (xor(a, x::HUGEINT) * 1099511628211::HUGEINT) % 18446744073709551616::HUGEINT) AS f
                   FROM hx2) y)
      SELECT doc_id, quality, n_tokens,
             CASE WHEN ((fnv % 100) + 100) % 100 < 80 THEN 'train'
                  WHEN ((fnv % 100) + 100) % 100 < 90 THEN 'validation'
                  ELSE 'test' END AS split
      FROM fh2 ORDER BY doc_id"""),
    (s, dir) => {
      val docs = t(s, dir, "documents")
      graft.operators.Pipeline.release(
          docs.filter(pmod(col("doc_id"), lit(50)) =!= 0),
          docs.filter(pmod(col("doc_id"), lit(50)) === 0))
        .orderBy(col("doc_id"))
    })

  /** BM25 keyword search (Lucene's +1 idf form), top-10 for a 3-term
    * query — scores via zero-explode tf projections + a one-row corpus
    * stats broadcast; ranking is top-k fused. The oracle replays the
    * identical arithmetic (same operand order, ln, round-4, doc_id
    * tiebreak) over DuckDB list lambdas. */
  private val textBm25 = Q(
    "text_bm25",
    Some("""
      WITH toks AS (
        SELECT doc_id,
               list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'), x -> x <> '') AS t
        FROM documents),
      per AS (
        SELECT doc_id, len(t) AS dl,
               len(list_filter(t, x -> x = 'spark')) AS tf0,
               len(list_filter(t, x -> x = 'vector')) AS tf1,
               len(list_filter(t, x -> x = 'merge')) AS tf2
        FROM toks),
      stats AS (
        SELECT count(*)::DOUBLE AS n, avg(dl) AS avgdl,
               sum(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df0,
               sum(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df1,
               sum(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END)::DOUBLE AS df2
        FROM per),
      scored AS (
        SELECT doc_id,
               round(
                 ln(1.0 + (n - df0 + 0.5) / (df0 + 0.5)) * tf0::DOUBLE * (1.2 + 1.0)
                   / (tf0::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
                 + ln(1.0 + (n - df1 + 0.5) / (df1 + 0.5)) * tf1::DOUBLE * (1.2 + 1.0)
                   / (tf1::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl))
                 + ln(1.0 + (n - df2 + 0.5) / (df2 + 0.5)) * tf2::DOUBLE * (1.2 + 1.0)
                   / (tf2::DOUBLE + 1.2 * ((1.0 - 0.75) + 0.75 * dl / avgdl)), 4) AS score
        FROM per, stats)
      SELECT doc_id, score FROM scored WHERE score > 0
      ORDER BY score DESC, doc_id LIMIT 10"""),
    (s, dir) =>
      graft.operators.TextAnalysis.bm25(
        t(s, dir, "documents"), col("doc_id"), col("text"),
        queryTerms = Seq("spark", "vector", "merge"), k = 10))

  /** The TVF SQL faces (plans/LlmTableFunctions.scala), each under the
    * SAME oracle as its library-API row — proving the SQL surface is
    * resolution sugar over the identical distributed plan, not a
    * second implementation. The `documents`/`embeddings` views are
    * registered by Engine.t before the SQL runs. */
  private val tvfDedupExact = Q(
    "sql_tvf_dedup_exact",
    dedupExact.oracle,
    (s, dir) => {
      t(s, dir, "documents")
      s.sql("""
        SELECT * FROM graft_dedup_exact('documents',
          'array_join(array_sort(array_distinct(split(text, \' \'))), \' \')',
          'doc_id')
        ORDER BY keep_id""")
    })

  private val tvfSemanticDedup = Q(
    "sql_tvf_semantic_dedup",
    dedupSemantic.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT * FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding',
                                           8, 2, 0.35D)
        ORDER BY vec_id""")
    })

  private val tvfAnnTopk = Q(
    "sql_tvf_ann_topk",
    annBrute.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_ann_queries AS
               SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5""")
      s.sql("""
        SELECT * FROM graft_ann_topk('embeddings', 'tvf_ann_queries',
                                     'vec_id', 'embedding', 5)
        ORDER BY query_id, rank""")
    })

  private val tvfMinhashPairs = Q(
    "sql_tvf_minhash_pairs",
    dedupMinhash.oracle,
    (s, dir) => {
      t(s, dir, "documents")
      s.sql("""
        SELECT * FROM graft_minhash_pairs('documents', 'doc_id', 'text',
                                          3, 16, 4, 0.5D)
        ORDER BY a_id, b_id""")
    })

  private val tvfSimhashPairs = Q(
    "sql_tvf_simhash_pairs",
    dedupSimhash.oracle,
    (s, dir) => {
      t(s, dir, "documents")
      s.sql("""
        SELECT a_id, b_id, CAST(hamming AS BIGINT) AS hamming
        FROM graft_simhash_pairs('documents', 'doc_id', 'text', 7, 8)
        ORDER BY a_id, b_id""")
    })

  private val tvfDedupClusters = Q(
    "sql_tvf_dedup_clusters",
    dedupCluster.oracle,
    (s, dir) => {
      t(s, dir, "documents")
      s.sql("""
        SELECT doc_id, cluster_id, cluster_size, is_canonical
        FROM graft_dedup_clusters('documents', 'doc_id', 'text', 3, 0.5D)
        ORDER BY doc_id""")
    })

  private val tvfSemanticDedup2 = Q(
    "sql_tvf_semantic_dedup2",
    dedupSemantic2.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                            'embedding', 3, 3, 2, 0.35D)
        ORDER BY vec_id""")
    })

  private val tvfKmeansAssign = Q(
    "sql_tvf_kmeans_assign",
    clusterKmeans.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT vec_id, cell_id
        FROM graft_kmeans_assign('embeddings', 'vec_id', 'embedding', 8, 2)
        ORDER BY vec_id""")
    })

  /** The union-recall dial through SQL: same oracle as the library's
    * `dedup_semantic2_union` row. */
  private val tvfSemanticDedup2Union = Q(
    "sql_tvf_semantic_dedup2_union",
    dedupSemantic2Union.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                            'embedding', 3, 3, 2, 0.35D,
                                            true)
        ORDER BY vec_id""")
    })

  /** The TWO-LEVEL fit materialized as a relation (`graft_kmeans_fit2`
    * — the scale path's fit-once-serve-many seam): the oracle re-runs
    * the ENTIRE two-level fit ([[twoLevelDuck]]) and must land on the
    * same super (`sub_id = -1`) and sub centroids in fit order. The
    * centroid arrays are exploded per dimension on BOTH sides (the
    * differ contract is scalar top-level columns only — r15 lesson:
    * a raw ARRAY<DOUBLE> column crashes the driver's row sort), so
    * the hash still compares every coordinate as a bare double. */
  private val tvfKmeansFit2 = Q(
    "sql_tvf_kmeans_fit2",
    Some(s"""$twoLevelDuck
      SELECT super_id, sub_id, CAST(g.i - 1 AS INTEGER) AS dim,
             cv[g.i] AS coord
      FROM (
        SELECT CAST(idx AS INTEGER) AS super_id, -1 AS sub_id, cv FROM s2
        UNION ALL
        SELECT CAST(s AS INTEGER) AS super_id, CAST(b AS INTEGER) AS sub_id,
               cv FROM b2) u, generate_series(1, 64) g(i)
      ORDER BY super_id, sub_id, dim"""),
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT super_id, sub_id, pos AS dim, col AS coord FROM (
          SELECT super_id, sub_id, posexplode(centroid)
          FROM graft_kmeans_fit2('embeddings', 'vec_id', 'embedding', 3, 3, 2))
        ORDER BY super_id, sub_id, dim""")
    })

  /** Two-level assignment against the prefitted index relation — the
    * oracle is the two-argmax composite assignment from the
    * independently re-derived fit. */
  private val tvfKmeansAssign2With = Q(
    "sql_tvf_kmeans_assign2_with",
    Some(s"""$twoLevelDuck
      SELECT vec_id, cell_id FROM cells ORDER BY vec_id"""),
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_idx2 AS
               SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id',
                                               'embedding', 3, 3, 2)""")
      s.sql("""
        SELECT vec_id, cell_id
        FROM graft_kmeans_assign2_with('embeddings', 'vec_id', 'embedding',
                                       'tvf_idx2')
        ORDER BY vec_id""")
    })

  /** Two-level SemDeDup against the prefitted index relation — same
    * oracle as the self-contained `graft_semantic_dedup2`. */
  private val tvfSemanticDedup2With = Q(
    "sql_tvf_semantic_dedup2_with",
    dedupSemantic2.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_idx2_sd AS
               SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id',
                                               'embedding', 3, 3, 2)""")
      s.sql("""
        SELECT * FROM graft_semantic_dedup2_with('embeddings', 'vec_id',
                                                 'embedding', 'tvf_idx2_sd',
                                                 0.35D)
        ORDER BY vec_id""")
    })

  /** The fit-once-serve-many seam in SQL: `graft_kmeans_fit`
    * materializes the Lloyd fit as a (cell_id, centroid) relation —
    * the oracle re-runs the whole fit in DuckDB and must land on the
    * SAME centroids (the 1e-9 mean quantization is what makes two
    * independent fits bit-agree). Exploded per dimension on BOTH
    * sides (scalar-columns differ contract — see [[tvfKmeansFit2]]);
    * the TVF's own relational schema stays array-typed. */
  private val tvfKmeansFit = Q(
    "sql_tvf_kmeans_fit",
    Some(s"""$kmeansDuck
      SELECT cell_id, CAST(g.i - 1 AS INTEGER) AS dim, cv[g.i] AS coord
      FROM c2, generate_series(1, 64) g(i)
      ORDER BY cell_id, dim"""),
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""
        SELECT cell_id, pos AS dim, col AS coord FROM (
          SELECT cell_id, posexplode(centroid)
          FROM graft_kmeans_fit('embeddings', 'vec_id', 'embedding', 8, 2))
        ORDER BY cell_id, dim""")
    })

  /** Assignment against the PREFITTED centroids relation: fit feeds
    * a temp view, `graft_kmeans_assign_with` assigns against it — and
    * the result must be IDENTICAL to the self-contained
    * `graft_kmeans_assign` (same oracle), proving the fit→materialize→
    * serve round trip loses nothing. */
  private val tvfKmeansAssignWith = Q(
    "sql_tvf_kmeans_assign_with",
    clusterKmeans.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_centroids AS
               SELECT * FROM graft_kmeans_fit('embeddings', 'vec_id',
                                              'embedding', 8, 2)""")
      s.sql("""
        SELECT vec_id, cell_id
        FROM graft_kmeans_assign_with('embeddings', 'vec_id', 'embedding',
                                      'tvf_centroids')
        ORDER BY vec_id""")
    })

  /** SemDeDup against the prefitted centroids relation — same oracle
    * as the self-contained `graft_semantic_dedup`. */
  private val tvfSemanticDedupWith = Q(
    "sql_tvf_semantic_dedup_with",
    dedupSemantic.oracle,
    (s, dir) => {
      t(s, dir, "embeddings")
      s.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_centroids_sd AS
               SELECT * FROM graft_kmeans_fit('embeddings', 'vec_id',
                                              'embedding', 8, 2)""")
      s.sql("""
        SELECT * FROM graft_semantic_dedup_with('embeddings', 'vec_id',
                                                'embedding',
                                                'tvf_centroids_sd', 0.35D)
        ORDER BY vec_id""")
    })

  override def defs: Seq[Q] = Seq(
    tvfDedupExact, tvfSemanticDedup, tvfAnnTopk,
    tvfMinhashPairs, tvfSimhashPairs, tvfDedupClusters,
    tvfSemanticDedup2, tvfKmeansAssign,
    tvfKmeansFit, tvfKmeansAssignWith, tvfSemanticDedupWith,
    tvfSemanticDedup2Union,
    tvfKmeansFit2, tvfKmeansAssign2With, tvfSemanticDedup2With,
    dedupExact, dedupJaccard, dedupMinhash, dedupSimhash, dedupCluster,
    dedupIncremental, dedupSpans, dedupSpansCut, dedupEmbedding,
    clusterKmeans, dedupSemantic, dedupSemantic2, dedupSemantic2Union,
    dedupSemantic2Rel,
    annBrute, annLsh, annIvf, annIvfFull, annLshFull,
    sq8QuantizeQ, annSq8Full, annSq8,
    pqEncodeQ, annPqFull, annPq,
    textLangid, textQuality, textTokens, textChunks, textFingerprint, textLmScore,
    textRepetition, textEntropy, textQualityGate, textBm25,
    multimodalFrames, multimodalDecode, llmPipeline, llmRelease,
    dataSampleHash, dataSampleStratified, dataShards, dataPackBlocks, dataVocabTopk,
    dataRedact, dataProfile, dataMixture, dataDecontaminate, dataHotShingles,
    dataSplit, dataShuffle)
}
