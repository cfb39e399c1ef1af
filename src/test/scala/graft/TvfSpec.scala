package graft

import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** SQL faces for the LLM operators (LlmTableFunctions.scala): each TVF
  * must produce EXACTLY the library operator's result (same rows, same
  * schema) and stay a distributed plan — the TVF is resolution sugar,
  * not a different implementation. */
class TvfSpec extends AnyFunSuite {
  import TestSpark._

  private def registered(): Unit = Engine.registerDir(spark, sf0001)

  test("graft_dedup_exact TVF == Dedup.exact, key expression resolves against the table") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_dedup_exact('documents',
        'array_join(array_sort(array_distinct(split(text, \' \'))), \' \')',
        'doc_id')
      ORDER BY keep_id""").collect()
    val lib = Dedup.exact(Engine.t(spark, sf0001, "documents"),
        org.apache.spark.sql.functions.array_join(
          org.apache.spark.sql.functions.array_sort(
            org.apache.spark.sql.functions.array_distinct(
              org.apache.spark.sql.functions.split(col("text"), " "))), " "),
        col("doc_id"))
      .orderBy(col("keep_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.nonEmpty)
  }

  test("graft_semantic_dedup TVF == Similarity.semanticDedup and composes in SQL") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding',
                                         8, 2, 0.35D)
      ORDER BY vec_id""").collect()
    val lib = Similarity.semanticDedup(Engine.t(spark, sf0001, "embeddings"),
        "vec_id", "embedding", nCells = 8, iters = 2, threshold = 0.35)
      .orderBy(col("vec_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    // the TVF result is a relation: filters/aggregates compose over it
    val kept = spark.sql("""
      SELECT count(*) AS kept
      FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding', 8, 2, 0.35D)
      WHERE dup_of IS NULL""").collect().head.getLong(0)
    assert(kept == lib.count(_.isNullAt(2)))
  }

  test("graft_ann_topk TVF == bruteForceTopK over a temp-view query side") {
    registered()
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_ann_q AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 3""")
    val sql = spark.sql("""
      SELECT * FROM graft_ann_topk('embeddings', 'tvf_ann_q',
                                   'vec_id', 'embedding', 4)
      ORDER BY query_id, rank""").collect()
    val emb = Engine.t(spark, sf0001, "embeddings")
    val lib = Similarity.bruteForceTopK(
        emb.select(col("vec_id"), col("embedding")),
        emb.filter(col("vec_id") < 3).select(col("vec_id").as("q_id"),
          col("embedding").as("q_vec")),
        "vec_id", "embedding", "q_id", "q_vec", k = 4)
      .orderBy(col("query_id"), col("rank")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.length == 12) // 3 queries × top-4
  }

  test("TVF misuse fails with usage-carrying errors, not MatchErrors") {
    registered()
    val wrongArity = intercept[Exception](
      spark.sql("SELECT * FROM graft_semantic_dedup('embeddings', 'vec_id')")
        .collect())
    assert(wrongArity.getMessage.contains("graft_semantic_dedup("),
      wrongArity.getMessage)
    val nonConst = intercept[Exception](
      spark.sql("SELECT * FROM graft_ann_topk('embeddings', 'tvf_ann_q', 'vec_id', 'embedding', rand())")
        .collect())
    assert(nonConst.getMessage.contains("constant"), nonConst.getMessage)
  }
}
