package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.expressions.{Checksum, Fnv1a64}

/** Dataset-curation primitives a training-data pipeline runs constantly
  * (beyond the reference's surface — it has no sampling/packing at
  * all). All map-side or single-shuffle, and deterministic: sampling
  * decisions hash CONTENT, not row position, so a re-run (or a re-read
  * after a lost executor) selects the identical subset — the property
  * that makes 100 TB pipelines reproducible.
  */
object Curation {

  /** Stable 64-bit content hash (FNV-1a over UTF-8 bytes) — the same
    * kernel the dedup/multimodal ops use; DuckDB-reconstructible. */
  def contentHash(c: Column): Column = toCol(Fnv1a64(toExpr(encode(c, "UTF-8"))))

  /** Deterministic hash sample: keep rows whose content hash lands in
    * the first `percent` buckets of 100. Pure projection+filter — no
    * shuffle, no RNG state, reproducible on any cluster shape. */
  def hashSample(df: DataFrame, keyCol: Column, percent: Int): DataFrame =
    df.filter(pmod(contentHash(keyCol), lit(100)) < percent)

  /** Deterministic stratified sample: the `n` rows with the smallest
    * content hashes per stratum (hash order = uniform random order,
    * but stable). One shuffle on the stratum key. `tieBreak` must be a
    * unique column (e.g. the row id): two rows with IDENTICAL content
    * hash the same, and without a unique tie-break the boundary row of
    * a stratum would be engine/partitioning-dependent. */
  def stratifiedSample(df: DataFrame, stratum: Column, keyCol: Column, n: Int,
      tieBreak: Option[Column] = None): DataFrame = {
    val w = Window.partitionBy(stratum)
      .orderBy(contentHash(keyCol), tieBreak.getOrElse(keyCol))
    df.withColumn("__rk", row_number().over(w)).filter(col("__rk") <= n).drop("__rk")
  }

  /** GPT-style token-stream packing: within each `shard`, documents are
    * concatenated in `orderCol` order and the stream is cut into fixed
    * `blockTokens` blocks; each document reports the block range it
    * lands in. Sharded by design — data loaders shard anyway, and a
    * per-shard running sum is one shuffle with no global-order
    * bottleneck (a single unpartitioned window would serialize 100 TB
    * through one task). */
  def packBlocks(df: DataFrame, shard: Column, orderCol: Column,
      tokensCol: Column, blockTokens: Int): DataFrame = {
    val w = Window.partitionBy(shard).orderBy(orderCol)
    df
      .withColumn("__cum", sum(tokensCol).over(w))
      .withColumn("start_block",
        floor((col("__cum") - tokensCol) / blockTokens).cast("long"))
      .withColumn("end_block", floor((col("__cum") - 1) / blockTokens).cast("long"))
      .drop("__cum")
  }

  /** Sink-side shard manifest: deterministic shard assignment
    * (contentHash mod nShards — reproducible on any cluster shape, no
    * RNG) plus the per-shard summary a downstream training job verifies
    * against: doc count, token count, an order-independent XOR checksum
    * of content hashes, and the id range. Writing the shards themselves
    * is then `df.write.partitionBy("shard")`; the manifest makes the
    * output verifiable and re-runs byte-identical. One partial-agg
    * shuffle of nShards tiny rows at any corpus size. */
  def shardManifest(df: DataFrame, id: Column, key: Column, tokens: Column,
      nShards: Int): DataFrame =
    df.select(id.as("doc_id"), pmod(contentHash(key), lit(nShards)).as("shard"),
        contentHash(key).as("h"), tokens.cast("long").as("n_tok"))
      .groupBy(col("shard"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("n_tokens"),
        toCol(Checksum(toExpr(col("h"))).toAggregateExpression()).as("checksum"),
        min(col("doc_id")).as("min_id"),
        max(col("doc_id")).as("max_id"))

  /** Column profiler — the data-quality pass run before ingesting a new
    * source: per column, one row of (count, nulls, distinct, min, max),
    * all columns in a SINGLE aggregation pass; every metric is a
    * partial-merge-friendly builtin, so profiling 100 TB is one scan and
    * one shuffle of tiny partial states. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c)).cast("string").as(s"${c}__min"),
        max(col(c)).cast("string").as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    val rows = cols.map { c =>
      struct(lit(c).as("col_name"),
        col(s"${c}__n").as("n"), col(s"${c}__nulls").as("nulls"),
        col(s"${c}__distinct").as("n_distinct"),
        col(s"${c}__min").as("min_val"), col(s"${c}__max").as("max_val"))
    }
    wide.select(explode(array(rows: _*)).as("p")).select("p.*")
  }

  /** PII scrubbing: mask emails, phone-shaped numbers, and long digit
    * runs — the pre-training hygiene pass every text pipeline runs.
    * Pure codegen'd regexp projection, zero shuffle; patterns are
    * deliberately conservative (over-masking beats leaking). */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"
  val longDigitsRe = "[0-9]{6,}"

  def redact(text: Column): Column = {
    val e = regexp_replace(text, emailRe, "<EMAIL>")
    val p = regexp_replace(e, phoneRe, "<PHONE>")
    regexp_replace(p, longDigitsRe, "<NUM>")
  }

  /** Deterministic source-mixture sampling — the "data recipe" step of
    * LLM training-set assembly: each source is up- or down-weighted to a
    * target number of epochs (e.g. books 2.5×, web 0.4×, exclude 0).
    * `epochs = 2.5` emits 2 full copies of every row plus a 50%
    * content-hash-selected tail copy; `0.4` keeps a 40% sample;
    * `0.0` drops the source. Selection hashes CONTENT (same FNV kernel
    * as hashSample), so the recipe is byte-reproducible on any cluster
    * shape and the fractional tail is an unbiased uniform subset. Pure
    * explode+filter projection — zero shuffle, and the fan-out factor
    * is the recipe's own epoch count (never data-dependent). */
  def mixture(df: DataFrame, source: Column, keyCol: Column,
      epochs: Map[String, Double], defaultEpochs: Double = 1.0): DataFrame = {
    val e = epochs.foldLeft(lit(defaultEpochs)) { case (acc, (s, w)) =>
      when(source === s, lit(w)).otherwise(acc)
    }
    val full = floor(e).cast("int")
    val fracPct = round((e - floor(e)) * 100).cast("int")
    df.withColumn("copy_idx", explode(sequence(lit(0), full)))
      .filter(col("copy_idx") < full ||
        pmod(contentHash(keyCol), lit(100)) < fracPct)
  }

  /** Deterministic train/validation/test split: content-hash buckets
    * 0..99 cut at `trainPct` and `trainPct + valPct`. Map-side and
    * STABLE under corpus growth — a document's split assignment never
    * changes when other documents arrive or partitioning changes,
    * which is what keeps eval sets honest across pipeline re-runs. */
  def assignSplit(df: DataFrame, keyCol: Column, trainPct: Int, valPct: Int): DataFrame = {
    val b = pmod(contentHash(keyCol), lit(100))
    df.withColumn("split",
      when(b < trainPct, "train")
        .when(b < trainPct + valPct, "validation")
        .otherwise("test"))
  }

  /** Deterministic sharded training order: shard = content-hash bucket,
    * `ord` = rank of a seed-salted hash within the shard. Re-runs give
    * byte-identical epoch order on any cluster shape; a new seed is a
    * fresh permutation. One shuffle on the shard key, rank windows are
    * per-shard (no global-order bottleneck — same sharding argument as
    * `packBlocks`). */
  def shuffleOrder(df: DataFrame, keyCol: Column, seed: String, shards: Int,
      tieBreak: Option[Column] = None): DataFrame = {
    val h = contentHash(concat_ws("", lit(seed), keyCol))
    df.withColumn("__h", h)
      .withColumn("shard", pmod(col("__h"), lit(shards)))
      .withColumn("ord", row_number().over(
        Window.partitionBy(col("shard"))
          .orderBy(col("__h"), tieBreak.getOrElse(keyCol))))
      .drop("__h")
  }

  /** Top-k n-gram vocabulary with deterministic tiebreak — the
    * "count words over everything" job: explode → two-phase hash
    * aggregate (map-side partial) → TakeOrderedAndProject. */
  def vocabTopK(df: DataFrame, textCol: Column, n: Int, k: Int): DataFrame = {
    val grams = explode(Dedup.shingles(textCol, n)).as("ngram")
    df.select(grams)
      .groupBy(col("ngram")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("ngram"))
      .limit(k)
  }
}
