package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.functions._

import graft.functions.expressions.RollingFingerprint

/** Text-analysis operators for training-data pipelines: language ID,
  * quality scoring, token counting, fingerprinting. All pure column
  * expressions — they run inside whole-stage codegen'd projections with
  * no shuffle, so they cost one scan at any scale.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (n-gram-heuristic language ID).
    * Order matters: deterministic tiebreak prefers earlier languages. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein"),
    "fr" -> Seq("le", "la", "les", "et", "est", "un"),
    "es" -> Seq("el", "los", "las", "y", "es", "un"),
    "zh" -> Seq("的", "是", "在", "了", "和"))

  /** Language ID: distinct-stopword hit count per language, argmax with
    * first-listed-language tiebreak; 'und' (undetermined) when nothing
    * hits. Implemented as array_max over (score, -rank, lang) structs —
    * lexicographic struct ordering gives the deterministic argmax. */
  def langId(text: Column): Column = {
    val toks = split(lower(text), "\\s+")
    val scored = stopwords.zipWithIndex.map { case ((lang, words), i) =>
      struct(
        size(array_intersect(toks, array(words.map(lit): _*))).as("score"),
        lit(-i).as("neg_rank"),
        lit(lang).as("lang"))
    }
    when(array_max(array(scored: _*)).getField("score") > 0,
      array_max(array(scored: _*)).getField("lang")).otherwise(lit("und"))
  }

  /** Heuristic quality score in [0,1]: blends length, punctuation ratio,
    * stopword ratio, and mean word length (the classic cheap filters). */
  def qualityScore(text: Column): Column = {
    val n = length(text)
    val toks = split(text, "\\s+")
    val nTok = size(toks)
    val punct = length(regexp_replace(text, "[^.,;:!?]", ""))
    val allStops = stopwords.flatMap(_._2).distinct
    val stopHits = size(filter(toks, t => t.isin(allStops.map(lit(_).asInstanceOf[Any]): _*)))
    val lenScore = least(n / lit(500.0), lit(1.0))
    val punctRatio = punct / greatest(n, lit(1)).cast("double")
    val punctScore = when(punctRatio <= 0.1, lit(1.0)).otherwise(greatest(lit(0.0), lit(1.0) - punctRatio * 5))
    val stopRatio = stopHits / greatest(nTok, lit(1)).cast("double")
    val stopScore = least(stopRatio * 5, lit(1.0))
    val meanWordLen = (n - nTok + 1) / greatest(nTok, lit(1)).cast("double")
    val wordLenScore = when(meanWordLen.between(3.0, 10.0), lit(1.0)).otherwise(lit(0.5))
    round(lenScore * 0.3 + punctScore * 0.2 + stopScore * 0.2 + wordLenScore * 0.3, 4)
  }

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, "\\s+"))

  /** BPE-ish subword proxy: words + punctuation marks counted separately
    * (regex \w+|[^\w\s]) — the standard pre-tokenizer shape. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z0-9_]+|[^a-zA-Z0-9_\\s]"), lit(0)))

  /** Content fingerprint: md5 of casefolded, punctuation-stripped,
    * whitespace-collapsed text (bag-preserving normalization). */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9\\s]", ""), "\\s+", " ")))

  /** Order-sensitive rolling-hash fingerprint (Rabin-Karp, mod 1e9+7). */
  def rollingFingerprint(text: Column): Column = toCol(RollingFingerprint(toExpr(text)))

  /** Character-entropy quality signal (bits/char): low entropy flags
    * repetitive/boilerplate text, near-random entropy flags binary
    * junk. ONE sorted-run fold over `array_sort(cs)`: a run of equal
    * chars ends when the next char differs, contributing its
    * -p·log2(p) term right there — O(n log n) per doc, no nested
    * rescan (the previous per-distinct-char `filter` was O(u·n):
    * fine for Latin's ~100 distinct chars, a straggler-task hazard
    * for unique-heavy CJK docs — the same bug class as the round-4
    * repetitionStats advisory, fixed with the same fold). Terms
    * accumulate in sorted-distinct-char order with p = count/n and
    * log2 = ln(p)/ln(2), exactly the sequence the naive form adds, so
    * results are bit-identical (equivalence property-tested in
    * LlmOpsSpec). Zero shuffle at any scale. */
  def charEntropy(text: Column): Column = {
    val cs = split(text, "")
    val n = length(text).cast("double")
    def term(run: Column): Column = {
      val p = run.cast("double") / n
      -p * (log(p) / log(lit(2.0)))
    }
    // run=0 marks "no run open yet", so the "" init sentinel can never
    // be confused with a real first char (split never yields "" chars
    // for non-empty text; for empty text the single "" run folds the
    // same way either form computes it)
    round(
      aggregate(
        array_sort(cs),
        struct(lit("").as("prev"), lit(0L).as("run"), lit(0.0).as("acc")),
        (st, ch) => {
          val closes = st.getField("run") > 0 && ch =!= st.getField("prev")
          struct(
            ch.as("prev"),
            when(closes, lit(1L)).otherwise(st.getField("run") + 1).as("run"),
            when(closes, st.getField("acc") + term(st.getField("run")))
              .otherwise(st.getField("acc")).as("acc"))
        },
        st => when(st.getField("run") > 0,
          st.getField("acc") + term(st.getField("run")))
          .otherwise(st.getField("acc"))), 6)
  }

  /** Gopher-style repetition signals (Rae et al. 2021 §A1.1 quality
    * heuristics, adapted to single-line docs: word- and n-gram-level
    * repetition rather than line-level):
    *   - dup_word_frac  = 1 - distinct_tokens / tokens
    *   - top_word_frac  = count(most frequent token) / tokens
    *   - dup_2gram_frac = 1 - distinct_2grams / 2grams
    * All three are integer counts + one final rounded division, so any
    * engine recomputes them bit-exactly, and every count is row-local:
    * the whole operator is a zero-shuffle codegen'd projection — one
    * scan at 100 TB. The top-word count is O(n log n) per doc: sort the
    * row's tokens, then one linear fold finds the longest equal run
    * (= the max token frequency) — no nested rescan, so a 1M-token
    * straggler doc costs ~2·10⁷ comparisons, not 10¹² (the round-4
    * advisory). There is no per-corpus state, unlike
    * [[unigramLmScore]]. High dup/top fractions flag keyword-stuffed
    * or boilerplate docs for removal. */
  def repetitionStats(id: Column, text: Column): Seq[Column] = {
    val ts = split(text, " ")
    val nTok = size(ts)
    val g2 = when(nTok >= 2,
      transform(sequence(lit(1), nTok - 1),
        i => concat_ws(" ", element_at(ts, i), element_at(ts, i + 1))))
      .otherwise(array().cast("array<string>"))
    // longest equal run over sorted tokens == max frequency; the ""
    // sentinel is safe: a leading "" token extends run 0 -> 1, exactly
    // the count a first element should get
    val topCnt = aggregate(
      array_sort(ts),
      struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
      (acc, t) => {
        val run = when(t === acc.getField("prev"), acc.getField("run") + 1)
          .otherwise(lit(1))
        struct(t.as("prev"), run.as("run"),
          greatest(acc.getField("best"), run).as("best"))
      },
      acc => acc.getField("best"))
    Seq(
      id.as("doc_id"),
      round(lit(1.0) - size(array_distinct(ts)).cast("double") / nTok, 6)
        .as("dup_word_frac"),
      round(topCnt.cast("double") / nTok, 6).as("top_word_frac"),
      when(size(g2) > 0,
        round(lit(1.0) - size(array_distinct(g2)).cast("double") / size(g2), 6))
        .otherwise(lit(0.0)).as("dup_2gram_frac"))
  }

  /** Corpus-fit unigram LM score — the CCNet-style quality filter:
    * fit unigram log-probabilities over the corpus (one token-count
    * aggregate, top-`topK` vocabulary), then score each document as
    * the mean token log10-probability, OOV tokens at a floor. The fit
    * is a BOUNDED topK-row collect shipped as a map literal (the
    * fit-then-broadcast shape of the IVF/SQ8 paths — the vocabulary
    * cap is standard LM practice and what bounds driver state at
    * 100 TB); scoring is a pure row-local fold, so per-doc results
    * are bit-deterministic under any partitioning. Low scores = OOV-
    * heavy or token-distribution-atypical docs (spam, boilerplate,
    * wrong language). */
  def unigramLmScore(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      topK: Int = 50000, oovLogProb: Double = -10.0): org.apache.spark.sql.DataFrame = {
    val counts = df.select(explode(split(text, " ")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("tok")).limit(topK).collect()
    val total = counts.map(_.getLong(1)).sum.toDouble
    val probs: Map[String, Double] =
      counts.map(r => r.getString(0) -> math.log10(r.getLong(1) / total)).toMap
    val m = typedlit(probs)
    df.select(id.as("doc_id"),
      round(
        aggregate(transform(split(text, " "), t => coalesce(element_at(m, t), lit(oovLogProb))),
          lit(0.0), (acc, x) => acc + x) / size(split(text, " ")),
        4).as("lm_score"))
  }

  /** BM25 keyword search: top-k documents for a bag of query terms
    * (Robertson/Sparck Jones; the `+1` idf form Lucene uses, so idf is
    * never negative). The plan is built for corpus scale, NOT the
    * textbook explode-and-join shape:
    *
    *  - per-doc term frequencies are `size(filter(tokens, = term))`
    *    projections — one codegen'd scan, NO token explode (a 100 TB
    *    corpus never shuffles tokens);
    *  - corpus stats (N, avgdl, per-term document frequencies) reduce
    *    to ONE aggregate row — `2 + |terms|` scalars — broadcast back
    *    with a cross join (BroadcastNestedLoopJoin over 1 row);
    *  - the final ranking is TakeOrderedAndProject (top-k fusion), so
    *    only k rows per partition leave the executors.
    *
    * Scores are rounded to 4 decimals and tie-broken by doc_id, making
    * the top-k deterministic and oracle-comparable. Tokenization =
    * lowercase alnum runs (`[a-z0-9]+`), the same contract the dedup
    * shingles use. */
  def bm25(df: org.apache.spark.sql.DataFrame, id: Column, text: Column,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty && queryTerms.size <= 16,
      "bm25 expects 1-16 query terms (each term adds one tf column)")
    val toks = filter(split(lower(text), "[^a-z0-9]+"), t => t =!= lit(""))
    val tfCols = queryTerms.zipWithIndex.map { case (term, i) =>
      size(filter(col("__toks"), t => t === lit(term))).as(s"__tf_$i")
    }
    val perDoc = df
      .select(id.as("doc_id"), toks.as("__toks"))
      .select((col("doc_id") +: size(col("__toks")).as("__dl") +: tfCols): _*)
    // one row: N, avgdl, df_i — the whole corpus model for this query
    val statAggs = count(lit(1)).cast("double").as("__n") +:
      avg(col("__dl")).as("__avgdl") +:
      queryTerms.indices.map(i =>
        sum(when(col(s"__tf_$i") > 0, 1L).otherwise(0L)).cast("double").as(s"__df_$i"))
    val stats = perDoc.agg(statAggs.head, statAggs.tail: _*)
    val score = queryTerms.indices.map { i =>
      val tf = col(s"__tf_$i").cast("double")
      val idf = log(lit(1.0) + (col("__n") - col(s"__df_$i") + lit(0.5)) / (col(s"__df_$i") + lit(0.5)))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl") / col("__avgdl")))
    }.reduce(_ + _)
    perDoc.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("score"))
      .filter(col("score") > 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(k)
  }
  /** Overlapping character-window CHUNKING — the retrieval/embedding
    * preprocessing step: each document explodes into windows of
    * `chunkChars` characters starting every `chunkChars - overlap`
    * characters, so consecutive chunks share `overlap` characters and
    * no boundary sentence is lost to both sides. Pure map-side codegen
    * (sequence → explode → substring): zero shuffle at any corpus
    * size; output bytes ∝ input × chunkChars/stride, the minimum a
    * character-window chunker can emit. A trailing window whose
    * remainder fits inside the previous chunk's overlap is suppressed
    * (it would re-emit that tail verbatim); empty documents produce no
    * chunks. `chunk_idx = chunk_start / stride` is stable under any
    * partitioning — chunk identity is (doc, offset), not row order. */
  def chunk(df: DataFrame, id: Column, text: Column,
      chunkChars: Int, overlap: Int): DataFrame = {
    require(chunkChars > 0 && overlap >= 0 && overlap < chunkChars,
      s"need 0 <= overlap < chunkChars, got overlap=$overlap chunkChars=$chunkChars")
    val stride = chunkChars - overlap
    df.select(id.as("doc_id"), text.as("__t"))
      .select(col("doc_id"), col("__t"),
        explode(sequence(lit(0),
          greatest(length(col("__t")) - 1, lit(0)), lit(stride))).as("chunk_start"))
      .filter(col("chunk_start") === 0 ||
        length(col("__t")) - col("chunk_start") > overlap)
      .select(col("doc_id"),
        (col("chunk_start") / stride).cast("long").as("chunk_idx"),
        col("chunk_start").cast("long"),
        substring(col("__t"), col("chunk_start") + 1, lit(chunkChars)).as("chunk"))
      .filter(length(col("chunk")) > 0)
      .withColumn("n_chunk_chars", length(col("chunk")).cast("long"))
  }

}
