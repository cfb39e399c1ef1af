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

  test("graft_minhash_pairs TVF == Dedup.minhashLshPairs") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_minhash_pairs('documents', 'doc_id', 'text',
                                        3, 16, 4, 0.5D)
      ORDER BY a_id, b_id""").collect()
    val lib = Dedup.minhashLshPairs(Engine.t(spark, sf0001, "documents"),
        col("doc_id"), col("text"), n = 3, bands = 16, rowsPerBand = 4,
        threshold = 0.5)
      .orderBy(col("a_id"), col("b_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.nonEmpty)
  }

  test("graft_simhash_pairs TVF == Dedup.simhashPairs") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_simhash_pairs('documents', 'doc_id', 'text', 7, 8)
      ORDER BY a_id, b_id""").collect()
    val lib = Dedup.simhashPairs(Engine.t(spark, sf0001, "documents"),
        col("doc_id"), col("text"), maxHamming = 7, chunks = 8)
      .orderBy(col("a_id"), col("b_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.nonEmpty)
  }

  test("graft_dedup_clusters TVF == Dedup.clusters and composes in SQL") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_dedup_clusters('documents', 'doc_id', 'text',
                                         3, 0.5D)
      ORDER BY doc_id""").collect()
    val lib = Dedup.clusters(Engine.t(spark, sf0001, "documents"),
        col("doc_id"), col("text"), n = 3, threshold = 0.5)
      .orderBy(col("doc_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    // composes: canonical docs per cluster of size >= 2
    val canon = spark.sql("""
      SELECT count(*) AS c
      FROM graft_dedup_clusters('documents', 'doc_id', 'text', 3, 0.5D)
      WHERE is_canonical = 1 AND cluster_size >= 2""").collect().head.getLong(0)
    assert(canon > 0)
  }

  test("graft_semantic_dedup2 TVF == Similarity.semanticDedupTwoLevel") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D)
      ORDER BY vec_id""").collect()
    val lib = Similarity.semanticDedupTwoLevel(
        Engine.t(spark, sf0001, "embeddings"), "vec_id", "embedding",
        nSuper = 3, nSubPerCell = 3, iters = 2, threshold = 0.35)
      .orderBy(col("vec_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.nonEmpty)
  }

  test("graft_kmeans_assign TVF == Similarity.kmeansAssign") {
    registered()
    val sql = spark.sql("""
      SELECT vec_id, cell_id
      FROM graft_kmeans_assign('embeddings', 'vec_id', 'embedding', 8, 2)
      ORDER BY vec_id""").collect()
    val lib = Similarity.kmeansAssign(Engine.t(spark, sf0001, "embeddings"),
        "vec_id", "embedding", nCells = 8, iters = 2)
      .select(col("vec_id"), col("cell_id"))
      .orderBy(col("vec_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    assert(sql.nonEmpty)
  }

  test("TVF numeric args accept unsuffixed SQL literals (DecimalType)") {
    registered()
    // 0.35 with no D suffix parses as DECIMAL; the arg coercion must
    // take Spark's Decimal, not just java.lang.Number
    val dec = spark.sql("""
      SELECT count(*) AS n
      FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding',
                                8, 2, 0.35)""").collect().head.getLong(0)
    val sufx = spark.sql("""
      SELECT count(*) AS n
      FROM graft_semantic_dedup('embeddings', 'vec_id', 'embedding',
                                8, 2, 0.35D)""").collect().head.getLong(0)
    assert(dec == sufx && dec > 0)
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
