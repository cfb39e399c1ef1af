package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}

import graft.functions.expressions.{MinHashSignature, SimHash64}

/** Deduplication operators for training-data pipelines, each a
  * DataFrame → DataFrame transform designed for the 100 TB case:
  *
  *  - exact / canonical-key dedup: one hash-aggregate (map-side partial
  *    combine, one shuffle on the digest — the minimum possible);
  *  - exact n-gram Jaccard: inverted-index self-join on shingles — the
  *    exact algorithm that co-groups by shingle instead of O(n²) pairs;
  *  - MinHash + LSH banding: the scale path — candidate generation
  *    touches only colliding bands, then exact Jaccard verifies;
  *  - SimHash + pigeonhole banding for small Hamming radii;
  *  - embedding near-dup via brute-force or hyperplane-LSH (Similarity).
  *
  * Skew note (100 TB): shingle/band buckets can be hot (stopword-heavy
  * shingles). `maxBucket` drops buckets above a size cap — a standard
  * LSH skew guard: an over-full bucket carries almost no discriminative
  * signal but quadratic pair cost.
  */
object Dedup {

  /** Word n-gram shingle set of a text column (distinct). Spark's
    * sequence(1, 0) counts *down*, so short texts need the guard. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(text, " ")
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(array_distinct(
        transform(sequence(lit(1), size(toks) - (n - 1)),
          i => concat_ws(" ", slice(toks, i, lit(n))))))
  }

  /** Exact dedup on a digest of `key`: keeps the row with min `id` per
    * group. One shuffle on the digest. */
  def exact(df: DataFrame, key: Column, id: Column): DataFrame =
    df.groupBy(md5(key.cast("string")).as("dup_key"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("group_size"))

  /** Document-frequency skew guard for an inverted index: keeps only
    * postings of shingles whose document frequency is within
    * `maxBucket` (a hot shingle adds quadratic pair cost for near-zero
    * signal). Implemented as groupBy-count + join — the partial
    * (map-side) count aggregates BEFORE the exchange, so a hot
    * shingle's count arrives as a handful of partial rows instead of
    * one task buffering its full posting list (the
    * `Window.partitionBy(shingle)` form this replaces did exactly
    * that). PlanSpec asserts the partial-aggregate shape. */
  private def dfGuard(inv: DataFrame, maxBucket: Int): DataFrame =
    inv.join(
      inv.groupBy(col("shingle")).agg(count(lit(1)).as("df_count"))
        .filter(col("df_count") <= maxBucket)
        .select(col("shingle")),
      Seq("shingle"))

  /** All pairs with shingle-set Jaccard >= threshold — exact, via an
    * inverted-index join on shingles (never materializes the n² pairs). */
  def jaccardPairs(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double, maxBucket: Int = 10000): DataFrame = {
    val sh = df.select(id.as("doc_id"), shingles(text, n).as("sh"))
      .withColumn("sh_size", size(col("sh")))
    val inv = sh.select(col("doc_id"), col("sh_size"), explode(col("sh")).as("shingle"))
    // skew guard: drop shingles shared by too many docs (no signal, n² cost)
    val rare = dfGuard(inv, maxBucket)
    val a = rare.select(col("doc_id").as("a_id"), col("sh_size").as("a_size"), col("shingle"))
    val b = rare.select(col("doc_id").as("b_id"), col("sh_size").as("b_size"), col("shingle"))
    a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("a_size"), col("b_size"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common").cast("double") / (col("a_size") + col("b_size") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** MinHash signature column (array<bigint> of k hashes). */
  def minhashSignature(text: Column, n: Int, k: Int): Column =
    toCol(MinHashSignature(toExpr(shingles(text, n)), k))

  /** (doc_id, band, band_hash) LSH band keys of a (id, text) frame —
    * the shared banding kernel of the batch pair search and the
    * streaming ingest filter (EventStream.ingestDedupStream). */
  def bandKeys(df: DataFrame, id: Column, text: Column, n: Int,
      bands: Int, rowsPerBand: Int): DataFrame =
    bandedFrom(
      df.select(id.as("doc_id"), shingles(text, n).as("sh"))
        .withColumn("sig",
          toCol(MinHashSignature(toExpr(col("sh")), bands * rowsPerBand))),
      bands, rowsPerBand)

  /** Band key = (band index, hash of that band's slice of `sig`). */
  private def bandedFrom(docs: DataFrame, bands: Int, rowsPerBand: Int): DataFrame =
    docs.select(col("doc_id"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(b, slice(col("sig"), b * rowsPerBand + lit(1), lit(rowsPerBand))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_hash"))

  /** Near-dup pairs via MinHash LSH banding + exact Jaccard verify.
    * bands*rowsPerBand = k. Candidate pairs come only from band-hash
    * collisions; verification recomputes true Jaccard on the shingle
    * sets of candidates (joins back to the docs). */
  def minhashLshPairs(df: DataFrame, id: Column, text: Column, n: Int,
      bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val k = bands * rowsPerBand
    val docs = df.select(id.as("doc_id"), shingles(text, n).as("sh"))
      .withColumn("sig", toCol(MinHashSignature(toExpr(col("sh")), k)))
      .withColumn("sh_size", size(col("sh")))

    val banded = bandedFrom(docs, bands, rowsPerBand)

    val bucketed = banded.groupBy(col("band"), col("band_hash"))
      .agg(collect_list(col("doc_id")).as("ids"))
      .filter(size(col("ids")).between(2, maxBucket))

    val cands = bucketed
      .select(explode(col("ids")).as("a_id"), col("ids"))
      .select(col("a_id"), explode(col("ids")).as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct()

    val sets = docs.select(col("doc_id"), col("sh"), col("sh_size"))
    cands
      .join(sets.select(col("doc_id").as("a_id"), col("sh").as("a_sh"), col("sh_size").as("a_size")), "a_id")
      .join(sets.select(col("doc_id").as("b_id"), col("sh").as("b_sh"), col("sh_size").as("b_size")), "b_id")
      .withColumn("common", size(array_intersect(col("a_sh"), col("b_sh"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("a_size") + col("b_size") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Connected components over an undirected pair set — the step that
    * turns near-dup PAIRS into dedup CLUSTERS (pairs alone can't answer
    * "which docs are the same document": A~B and B~C must collapse to
    * one {A,B,C} cluster even when A~C was never emitted).
    *
    * Algorithm: iterative min-label propagation. Every node starts
    * labeled with itself; each round every node takes the min of its
    * own label and its neighbors' labels. Labels only decrease, so
    * sum(label) is a monotone convergence witness — one tiny aggregate
    * action per round, no row-by-row comparison. Rounds needed = graph
    * diameter: near-dup graphs are clique-ish (groups of mutually
    * similar docs), so 2-3 rounds in practice. Each round is one
    * edge⋈label shuffle of O(E) — at 100 TB that is the known-scalable
    * pattern (alternating large-star/small-star from Kiveris et al.
    * "Connected Components in MapReduce" gives O(log n) worst-case
    * rounds for adversarial chain graphs; min-label is the same
    * per-round plan and strictly simpler, with the iteration cap as the
    * guard). Per-round lineage is truncated by a checkpoint so the plan
    * doesn't grow with iterations: `localCheckpoint` (executor-local,
    * fine for local mode) by default, or a RELIABLE checkpoint when
    * `reliableCheckpoint = true` — on a real cluster executor loss makes
    * local checkpoints unrecoverable, so set
    * `spark.sparkContext.setCheckpointDir(<hdfs/s3 path>)` and pass the
    * flag.
    *
    * Input: two id columns (pair orientation irrelevant); they must be
    * integral (fail-fast — a silent cast of string ids to NULL would
    * drop edges and return wrong clusters). Output: (id, cluster_id)
    * for every node that appears in some pair, where cluster_id = min
    * node id in the component.
    */
  def connectedComponents(pairs: DataFrame, a: String = "a_id",
      b: String = "b_id", maxIter: Int = 20,
      reliableCheckpoint: Boolean = false): DataFrame =
    connectedComponentsWithRounds(pairs, a, b, maxIter, reliableCheckpoint)._1

  /** As [[connectedComponents]], additionally returning how many
    * propagation rounds ran until the convergence witness stabilized —
    * the telemetry a scale run records (rounds ≈ graph diameter; each
    * round is one O(E) shuffle). */
  def connectedComponentsWithRounds(pairs: DataFrame, a: String = "a_id",
      b: String = "b_id", maxIter: Int = 20,
      reliableCheckpoint: Boolean = false): (DataFrame, Int) = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    Seq(a, b).foreach { c =>
      val dt = pairs.schema(c).dataType
      require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
        s"connectedComponents: id column '$c' must be integral, got $dt " +
          "(a lossy cast would silently drop edges)")
    }
    def ckpt(df: DataFrame): DataFrame =
      if (reliableCheckpoint) df.checkpoint(true) else df.localCheckpoint(true)
    val edges = ckpt(
      pairs.select(col(a).cast("long").as("src"), col(b).cast("long").as("dst"))
        .union(pairs.select(col(b).cast("long").as("src"), col(a).cast("long").as("dst")))
        .distinct())
    var labels = ckpt(
      edges.select(col("src").as("id")).distinct()
        .withColumn("label", col("id")))
    // no pairs at all → no non-singleton components (sum() over zero
    // rows is NULL, so the convergence witness needs the early exit)
    if (labels.isEmpty)
      return (labels.select(col("id"), col("label").as("cluster_id")), 0)
    var checksum = labels.agg(sum(col("label"))).head.getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = edges.join(labels, edges("dst") === labels("id"))
        .groupBy(col("src")).agg(min(col("label")).as("nbr_min"))
      labels = ckpt(
        labels.join(nbrMin, labels("id") === nbrMin("src"), "left")
          .select(col("id"), least(col("label"), coalesce(col("nbr_min"), col("label"))).as("label")))
      val next = labels.agg(sum(col("label"))).head.getLong(0)
      converged = next == checksum
      checksum = next
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    (labels.select(col("id"), col("label").as("cluster_id")), iter)
  }

  /** Full dedup clustering of a document set: near-dup pairs → connected
    * components → one row per document with its cluster id, cluster
    * size, and whether it is the canonical (minimum-id) representative
    * the pipeline keeps. Docs with no near-dup are their own singleton
    * cluster. Default pair source is exact n-gram Jaccard (the
    * oracle-checkable path); pass `useLsh = true` for MinHash+LSH
    * candidate generation — the 100 TB path, identical downstream
    * plumbing, recall governed by the banding parameters. */
  def clusters(df: DataFrame, id: Column, text: Column, n: Int,
      threshold: Double, useLsh: Boolean = false): DataFrame = {
    val pairs =
      if (useLsh) minhashLshPairs(df, id, text, n, bands = 16, rowsPerBand = 4, threshold)
      else jaccardPairs(df, id, text, n, threshold)
    val comps = connectedComponents(pairs)
    val withCluster = df.select(id.as("doc_id"))
      .join(comps.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .withColumn("cluster_id", coalesce(col("cluster_id"), col("doc_id")))
    // cluster_size via groupBy-count + join, NOT a count().over(Window
    // .partitionBy(cluster_id)): the window form buffers every row of a
    // cluster in one task, and web corpora routinely have one
    // mega-cluster of millions of boilerplate near-identical docs. The
    // aggregate gets a map-side partial combine, so the shuffle carries
    // one (cluster_id, partial_count) row per partition per cluster —
    // bounded regardless of cluster size (same shape as dfGuard).
    // Sizes come from the CHECKPOINTED components side (comps holds one
    // row per non-singleton-cluster member), not from withCluster —
    // re-aggregating withCluster would re-execute the full document
    // scan and the components join a second time. Docs absent from
    // comps are their own singleton cluster: size 1 via coalesce.
    val sizes = comps.groupBy(col("cluster_id"))
      .agg(count(lit(1)).as("cluster_size"))
    withCluster
      .join(sizes, Seq("cluster_id"), "left")
      .select(col("doc_id"), col("cluster_id"),
        coalesce(col("cluster_size"), lit(1L)).as("cluster_size"))
      .withColumn("is_canonical",
        (col("doc_id") === col("cluster_id")).cast("int"))
  }

  /** Incremental near-dup check — the daily-ingest reality at 100 TB:
    * a new batch is checked against the existing corpus WITHOUT
    * re-pairing the corpus against itself (corpus×corpus pairs are
    * never generated; each batch doc banding-joins only the corpus
    * buckets it collides with). Returns (new_id, corpus_id, jaccard)
    * for every cross-pair at or above the threshold — candidates from
    * MinHash LSH banding, verified by exact Jaccard on the shingle
    * sets. In production the corpus side's signatures/bands are
    * precomputed and stored; here they are derived inline from text
    * (the banding math is identical either way). */
  def incrementalLshPairs(newDocs: DataFrame, corpus: DataFrame, id: Column,
      text: Column, n: Int, bands: Int, rowsPerBand: Int, threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val cands = bandKeys(newDocs, id, text, n, bands, rowsPerBand)
      .withColumnRenamed("doc_id", "new_id")
      .join(guardedCorpusBands(corpus, id, text, n, bands, rowsPerBand, maxBucket),
        Seq("band", "band_hash"))
      .select(col("new_id"), col("corpus_id")).distinct()
    verifyCrossPairs(cands, newDocs, corpus, id, text, n, threshold)
  }

  /** (corpus_id, band, band_hash) band keys of the corpus with the
    * hot-bucket skew guard applied — THE shared corpus-side kernel of
    * the batch incremental path ([[incrementalLshPairs]]) and the
    * streaming ingest path (`EventStream.ingestDedupPairsStream`), so
    * the two can't silently diverge on guard semantics. */
  def guardedCorpusBands(corpus: DataFrame, id: Column, text: Column, n: Int,
      bands: Int, rowsPerBand: Int, maxBucket: Int): DataFrame = {
    val keys = bandKeys(corpus, id, text, n, bands, rowsPerBand)
    // groupBy-count + join, not Window.partitionBy: the map-side
    // partial count collapses a hot bucket's rows before the exchange
    // (same discipline as dfGuard — a window would buffer the whole
    // bucket in one task only to drop it)
    keys.join(
        keys.groupBy(col("band"), col("band_hash"))
          .agg(count(lit(1)).as("bucket_n"))
          .filter(col("bucket_n") <= maxBucket)
          .select(col("band"), col("band_hash")),
        Seq("band", "band_hash"))
      .select(col("doc_id").as("corpus_id"), col("band"), col("band_hash"))
  }

  /** Exact-Jaccard verification of cross-table candidate (new_id,
    * corpus_id) pairs: joins each candidate back to both sides' shingle
    * sets and keeps pairs at/above the threshold — the shared tail of
    * [[incrementalLshPairs]] and the STREAMING ingest path (candidates
    * from `EventStream.ingestDedupPairsStream`, verified on the
    * finished batch). Candidate sets are small relative to the corpus
    * (band collisions only), so both joins broadcast the candidate
    * side at scale. */
  def verifyCrossPairs(cands: DataFrame, newDocs: DataFrame, corpus: DataFrame,
      id: Column, text: Column, n: Int, threshold: Double): DataFrame = {
    val nd = newDocs.select(id.as("new_id"), shingles(text, n).as("new_sh"))
      .withColumn("new_size", size(col("new_sh")))
    val cd = corpus.select(id.as("corpus_id"), shingles(text, n).as("corpus_sh"))
      .withColumn("corpus_size", size(col("corpus_sh")))
    cands
      .join(nd, "new_id")
      .join(cd, "corpus_id")
      .withColumn("common", size(array_intersect(col("new_sh"), col("corpus_sh"))))
      .withColumn("jaccard",
        col("common").cast("double") / (col("new_size") + col("corpus_size") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("new_id"), col("corpus_id"), round(col("jaccard"), 4).as("jaccard"))
  }

  /** Cross-corpus contamination report — the test-set-leakage check a
    * training pipeline runs before every release: for each (train doc,
    * benchmark doc) pair, the CONTAINMENT of the benchmark doc's n-gram
    * set in the training doc (|train ∩ bench| / |bench| — the standard
    * leakage metric: a benchmark question pasted into a big web page has
    * tiny Jaccard but containment ≈ 1). Same inverted-index join as
    * `jaccardPairs` — candidates only where a shingle co-occurs, never
    * |train|×|bench| — with the same hot-shingle `maxBucket` guard; at
    * 100 TB the benchmark side is small, so the shuffle is dominated by
    * one pass over the training shingles. */
  def contaminationPairs(train: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int, threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val tSh = train.select(id.as("train_id"), shingles(text, n).as("sh"))
      .select(col("train_id"), explode(col("sh")).as("shingle"))
    val bSh = bench.select(id.as("bench_id"), shingles(text, n).as("sh"))
      .withColumn("bench_size", size(col("sh")))
      .select(col("bench_id"), col("bench_size"), explode(col("sh")).as("shingle"))
    val rare = dfGuard(tSh, maxBucket)
    rare.join(bSh, Seq("shingle"))
      .groupBy(col("train_id"), col("bench_id"), col("bench_size"))
      .agg(count(lit(1)).as("common"))
      .withColumn("containment", col("common").cast("double") / col("bench_size"))
      .filter(col("containment") >= threshold)
      .select(col("train_id"), col("bench_id"),
        round(col("containment"), 4).as("containment"))
  }

  /** Decontaminated training set: drop every training doc whose
    * containment of ANY benchmark doc meets the threshold (left-anti
    * join against the contamination report). `maxBucket` is the same
    * hot-shingle guard `contaminationPairs` carries — and because this
    * check is safety-relevant (a dropped hot shingle UNDER-counts
    * containment, i.e. can let leakage through), the guard is tunable
    * here and observable via [[hotShingles]]: run that report alongside
    * a release and alert when benchmark shingles land in the dropped
    * set. */
  def decontaminate(train: DataFrame, bench: DataFrame, id: Column,
      text: Column, n: Int, threshold: Double,
      maxBucket: Int = 10000): DataFrame = {
    val contaminated = contaminationPairs(train, bench, id, text, n, threshold,
        maxBucket)
      .select(col("train_id")).distinct()
    train.join(contaminated, id === col("train_id"), "left_anti")
  }

  /** Observability companion to [[decontaminate]]/[[contaminationPairs]]:
    * the shingles the `maxBucket` skew guard would DROP (document
    * frequency above the cap), with their frequencies — lazily
    * evaluated, so pipelines can count/log it without the operator
    * itself paying an extra action. A benchmark doc composed mostly of
    * corpus-common n-grams is the recall-loss case this surfaces. */
  def hotShingles(train: DataFrame, id: Column, text: Column, n: Int,
      maxBucket: Int = 10000): DataFrame =
    train.select(id.as("train_id"), explode(shingles(text, n)).as("shingle"))
      .groupBy(col("shingle")).agg(count(lit(1)).as("df_count"))
      .filter(col("df_count") > maxBucket)

  /** Span-level exact dedup stats (Lee et al. 2021, "Deduplicating
    * Training Data Makes Language Models Better", arXiv:2107.06499):
    * per document, the maximal token runs covered by k-grams that occur
    * more than once ANYWHERE in the corpus (self-repeats included) —
    * the output the paper computes with a suffix array, here via a
    * distributed k-gram positional index, which detects the same spans
    * for runs >= k tokens.
    *
    * Plan shape for 100 TB: grams are row-local (posexplode of a
    * transform); duplicate detection is one groupBy(gram) with map-side
    * partial counts; the hits join ships (gram, doc, pos) — shuffle ∝
    * Σ grams (at real scale, key the join on a 128-bit digest of the
    * gram to bound bytes; the string key here keeps the DuckDB oracle
    * byte-exact). Interval merge is a per-doc window (one shuffle on
    * doc_id). No driver state anywhere.
    *
    * Returns (doc_id, n_spans, dup_tokens, dup_frac) for every input
    * doc; excising the spans (the paper's "cut" step) is then a join +
    * row-local token filter.
    *
    * `digestKeyed = true` keys the duplicate-detection groupBy and the
    * hits join on a 128-bit md5 digest of the gram instead of the gram
    * string — the production form SCALE.md promises: shuffle bytes are
    * bounded at 16 bytes/gram regardless of k or token length, and a
    * 128-bit digest makes a false gram collision (which would only
    * over-mark a span) cosmically unlikely. The string-keyed default
    * stays because it keeps the DuckDB oracle byte-exact; the two
    * paths are equivalence-tested in LlmOpsSpec.
    */
  def duplicateSpans(df: DataFrame, id: Column, text: Column, k: Int,
      digestKeyed: Boolean = false): DataFrame = {
    val (base, spans) = spanTables(df, id, text, k, digestKeyed)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"), sum(col("e") - col("s") + 1).as("dup_tokens"))
    base.select(col("doc_id"), col("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        round(coalesce(col("dup_tokens"), lit(0L)).cast("double") / col("n_tokens"), 6)
          .as("dup_frac"))
  }

  /** The paper's "cut" step: the corpus with every duplicate span
    * excised. Spans per doc are a bounded collect_list (span count ≤
    * n_tokens/1, in practice a handful) broadcast-joined back; token
    * filtering is row-local. The kept indices are built as the GAPS
    * between the sorted spans — one `sequence` per gap, flattened —
    * so the cost is O(n_tokens + n_spans) per doc, not the
    * O(n_tokens × n_spans) a per-token `exists` over the span list
    * costs (adversarial docs alternating duplicate/unique k-grams
    * have n_spans ∝ n/k, making that form quadratic row-local work;
    * equivalence on exactly that shape is property-tested in
    * LlmOpsSpec). Valid because [[spanTables]] emits merged DISJOINT
    * islands: after array_sort, span j+1 starts at least one token
    * after span j ends. Returns (doc_id, cleaned, kept_tokens). */
  def exciseDuplicateSpans(df: DataFrame, id: Column, text: Column, k: Int,
      digestKeyed: Boolean = false): DataFrame = {
    val (base, spans) = spanTables(df, id, text, k, digestKeyed)
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(collect_list(struct(col("s"), col("e"))).as("sps"))
    val sps = array_sort(col("sps"))
    val m = size(sps)
    val n = col("n_tokens").cast("long")
    // gap j (0-based) runs from the end of span j (or token 1) to the
    // start of span j+1 (or the last token); `when` evaluates lazily,
    // so element_at never sees an out-of-range index
    val kept = flatten(transform(sequence(lit(0), m), j => {
      val gapStart = when(j === 0, lit(1L))
        .otherwise(element_at(sps, j).getField("e") + 1L)
      val gapEnd = when(j === m, n)
        .otherwise(element_at(sps, j + 1).getField("s") - 1L)
      when(gapStart <= gapEnd, sequence(gapStart, gapEnd))
        .otherwise(array().cast("array<bigint>"))
    }))
    base.join(perDoc, Seq("doc_id"), "left")
      .withColumn("sps",
        coalesce(col("sps"), array().cast("array<struct<s:bigint,e:bigint>>")))
      .withColumn("kept", kept)
      .select(col("doc_id"),
        array_join(transform(col("kept"), i => element_at(col("ts"), i.cast("int"))), " ")
          .as("cleaned"),
        size(col("kept")).cast("long").as("kept_tokens"))
  }

  /** Shared machinery for [[duplicateSpans]]/[[exciseDuplicateSpans]]:
    * (base(doc_id, ts, n_tokens), merged spans(doc_id, s, e)).
    * `digestKeyed` swaps the gram string for its 16-byte md5 digest as
    * the shuffle key of the duplicate groupBy + hits join (identical
    * plan shape, bounded key bytes — the 100 TB form). */
  private def spanTables(df: DataFrame, id: Column, text: Column,
      k: Int, digestKeyed: Boolean = false): (DataFrame, DataFrame) = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("pos"))
    val base = df.select(id.as("doc_id"), split(text, " ").as("ts"))
      .withColumn("n_tokens", size(col("ts")))
    val gramKey: Column => Column =
      if (digestKeyed) g => unhex(md5(g)) else identity
    val grams = base.filter(col("n_tokens") >= k)
      .select(col("doc_id"),
        posexplode(transform(sequence(lit(1), col("n_tokens") - (k - 1)),
          i => concat_ws(" ", slice(col("ts"), i, lit(k))))))
      .select(col("doc_id"), (col("pos") + 1).cast("long").as("pos"),
        gramKey(col("col")).as("gram"))
    val dup = grams.groupBy(col("gram")).agg(count(lit(1)).as("c"))
      .filter(col("c") > 1).select(col("gram"))
    val hits = grams.join(dup, Seq("gram")).select(col("doc_id"), col("pos"))
    // island detection: a hit starts a new span iff it does not overlap
    // the previous hit's k-token window
    val spans = hits
      .withColumn("ni",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(w), lit(-1000000L)) + (k - 1), 1)
          .otherwise(0))
      .withColumn("island", sum(col("ni")).over(w))
      .groupBy(col("doc_id"), col("island"))
      .agg(min(col("pos")).as("s"), (max(col("pos")) + (k - 1)).as("e"))
    (base, spans)
  }

  /** SimHash fingerprint of whitespace tokens. */
  def simhash(text: Column): Column = toCol(SimHash64(toExpr(split(text, " "))))

  /** Near-dup pairs with Hamming(simhash) <= maxHamming, found by
    * pigeonhole banding: split 64 bits into `chunks` pieces; any pair
    * within radius floor(chunks-1) shares at least one exact chunk, so
    * an equi-join on (chunk index, chunk value) finds all of them.
    * `maxBucket` is the same hot-bucket skew guard the Jaccard/MinHash
    * paths carry: a (chunk, value) shared by millions of near-identical
    * short docs is quadratic join cost for near-zero signal. */
  def simhashPairs(df: DataFrame, id: Column, text: Column,
      maxHamming: Int, chunks: Int = 8, maxBucket: Int = 10000): DataFrame = {
    require(maxHamming < chunks, "pigeonhole needs maxHamming < chunks")
    val width = 64 / chunks
    val fp = df.select(id.as("doc_id"), simhash(text).as("sh64"))
    val chunkVals = (0 until chunks).map(c =>
      shiftrightunsigned(col("sh64"), c * width).bitwiseAND(lit((1L << width) - 1)))
    val banded = fp.select(col("doc_id"), col("sh64"),
        posexplode(array(chunkVals: _*)))
      .select(col("doc_id"), col("sh64"), col("pos").as("chunk"), col("col").as("chunk_val"))
    // groupBy-count + join (map-side partial), not a posting-buffering
    // window — same skew discipline as dfGuard/guardedCorpusBands
    val guarded = banded.join(
      banded.groupBy(col("chunk"), col("chunk_val"))
        .agg(count(lit(1)).as("bucket_n"))
        .filter(col("bucket_n") <= maxBucket)
        .select(col("chunk"), col("chunk_val")),
      Seq("chunk", "chunk_val"))
    val a = guarded.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("a_id"), col("sh64").as("a_fp"))
    val b = guarded.select(col("chunk"), col("chunk_val"),
      col("doc_id").as("b_id"), col("sh64").as("b_fp"))
    a.join(b, Seq("chunk", "chunk_val"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_fp").bitwiseXOR(col("b_fp"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
