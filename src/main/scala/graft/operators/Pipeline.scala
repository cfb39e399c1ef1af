package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the capstone use of
  * the LLM operators: quality gate → language gate → exact dedup →
  * near-dedup, emitting the surviving corpus with per-doc metrics.
  *
  * Every stage is a DataFrame→DataFrame transform, so the whole
  * pipeline is one lazy plan: Catalyst fuses the scalar stages into the
  * scan projection; only the two dedup stages shuffle (one hash
  * aggregate + one inverted-index join). At 100 TB that is the minimum
  * data movement this semantics permits.
  */
object Pipeline {

  /** Near-dup survivor policy: for every pair (a < b) above the
    * threshold, the larger id is dropped (keep-earliest). */
  def curate(docs: DataFrame, minQuality: Double = 0.5, lang: String = "en",
      shingleN: Int = 3, jaccardThreshold: Double = 0.5): DataFrame = {
    val scored = docs.select(
      col("doc_id"), col("text"),
      TextAnalysis.qualityScore(col("text")).as("quality"),
      TextAnalysis.langId(col("text")).as("lang_pred"),
      TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))

    val gated = scored
      .filter(col("quality") >= minQuality && col("lang_pred") === lang)

    // exact dedup on canonical vocabulary: keep min doc_id per group
    val canonical = array_join(array_sort(array_distinct(split(col("text"), " "))), " ")
    val keepers = gated
      .withColumn("canon_key", md5(canonical))
      .withColumn("keep_id", min(col("doc_id"))
        .over(org.apache.spark.sql.expressions.Window.partitionBy(col("canon_key"))))
      .filter(col("doc_id") === col("keep_id"))
      .drop("canon_key", "keep_id")

    // near-dedup: drop the later doc of every high-jaccard pair
    val dropIds = Dedup.jaccardPairs(keepers, col("doc_id"), col("text"),
        shingleN, jaccardThreshold)
      .select(col("b_id").as("drop_id")).distinct()

    keepers
      .join(dropIds, col("doc_id") === col("drop_id"), "left_anti")
      .select(col("doc_id"), col("quality"), col("n_tokens"))
  }

  /** The full RELEASE pipeline — what actually ships a training set:
    * `curate` (quality → language → exact dedup → near-dedup), then
    * benchmark decontamination (containment anti-join), then the
    * deterministic train/validation/test split. Still one lazy plan
    * end-to-end; the added stages contribute one inverted-index join
    * (bench side small) and a map-side hash split. */
  def release(docs: DataFrame, bench: DataFrame, minQuality: Double = 0.5,
      lang: String = "en", shingleN: Int = 3, jaccardThreshold: Double = 0.5,
      containment: Double = 0.5, trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    val kept = curate(docs, minQuality, lang, shingleN, jaccardThreshold)
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
    val clean = Dedup.decontaminate(kept, bench, col("doc_id"), col("text"),
      shingleN, containment)
    Curation.assignSplit(clean, col("text"), trainPct, valPct)
      .select(col("doc_id"), col("quality"), col("n_tokens"), col("split"))
  }
}
