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

  test("graft_semantic_dedup2 optional lsh_union arg == library lshUnion = true") {
    registered()
    val sql = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D, true)
      ORDER BY vec_id""").collect()
    val lib = Similarity.semanticDedupTwoLevel(
        Engine.t(spark, sf0001, "embeddings"), "vec_id", "embedding",
        nSuper = 3, nSubPerCell = 3, iters = 2, threshold = 0.35,
        lshUnion = true)
      .orderBy(col("vec_id")).collect()
    assert(sql.toSeq == lib.toSeq)
    // a non-boolean lsh_union is refused with the usage string
    val bad = intercept[Exception](spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D, 1)""")
      .collect())
    assert(bad.getMessage.contains("boolean") &&
      bad.getMessage.contains("graft_semantic_dedup2("), bad.getMessage)
  }

  test("graft_semantic_dedup2 optional lsh_bands arg: 0 = auto, bad values refused") {
    registered()
    // at sf0.001 the auto-sizer resolves to the narrow 16×4 banding
    // (LshAutoSpec), so explicit auto == explicit 16 == the omitted
    // default (which IS auto since r17) — proving the SQL plumbing
    // end-to-end without vacuously comparing auto to itself
    val auto = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D,
                                          true, 0)
      ORDER BY vec_id""").collect()
    val explicit16 = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D,
                                          true, 16)
      ORDER BY vec_id""").collect()
    val dflt = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D, true)
      ORDER BY vec_id""").collect()
    assert(auto.toSeq == explicit16.toSeq)
    assert(auto.toSeq == dflt.toSeq)
    assert(auto.nonEmpty)
    // a band count that does not divide 64 is refused loudly
    val bad = intercept[Exception](spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D,
                                          true, 3)""").collect())
    assert(bad.getMessage.contains("divid"), bad.getMessage)
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

  // every TVF × every misuse class: the usage string must reach the
  // user (the reference's typed binder errors, binder.rs:1504+, are
  // this surface's equivalent). `valid` is a known-good argument vector
  // each misuse is derived from.
  private val tvfCalls: Seq[(String, Seq[String])] = Seq(
    "graft_dedup_exact" -> Seq("'documents'", "'doc_id'", "'doc_id'"),
    "graft_semantic_dedup" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "8", "2", "0.35D"),
    "graft_semantic_dedup2" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "3", "3", "2", "0.35D"),
    "graft_kmeans_assign" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "8", "2"),
    "graft_kmeans_fit" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "8", "2"),
    "graft_ann_topk" ->
      Seq("'embeddings'", "'embeddings'", "'vec_id'", "'embedding'", "4"),
    "graft_minhash_pairs" ->
      Seq("'documents'", "'doc_id'", "'text'", "3", "16", "4", "0.5D"),
    "graft_simhash_pairs" ->
      Seq("'documents'", "'doc_id'", "'text'", "7", "8"),
    "graft_dedup_clusters" ->
      Seq("'documents'", "'doc_id'", "'text'", "3", "0.5D"),
    "graft_kmeans_assign_with" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "'tvf_neg_cents'"),
    "graft_semantic_dedup_with" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "'tvf_neg_cents'", "0.35D"),
    "graft_kmeans_fit2" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "3", "3", "1"),
    "graft_kmeans_assign2_with" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "'tvf_neg_idx2'"),
    "graft_semantic_dedup2_with" ->
      Seq("'embeddings'", "'vec_id'", "'embedding'", "'tvf_neg_idx2'", "0.35D"))

  test("every TVF rejects wrong arity / NULL arg / non-constant arg with its usage string") {
    registered()
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_neg_cents AS
                 SELECT * FROM graft_kmeans_fit('embeddings', 'vec_id',
                                                'embedding', 4, 1)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_neg_idx2 AS
                 SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id',
                                                 'embedding', 2, 2, 1)""")
    tvfCalls.foreach { case (fn, valid) =>
      def run(args: Seq[String]): Unit =
        spark.sql(s"SELECT * FROM $fn(${args.mkString(", ")})").collect()
      // wrong arity: drop the last argument
      val arity = intercept[Exception](run(valid.dropRight(1)))
      assert(arity.getMessage.contains(s"$fn("), s"$fn arity: ${arity.getMessage}")
      // NULL argument
      val nul = intercept[Exception](run(valid.dropRight(1) :+ "NULL"))
      assert(nul.getMessage.contains("NULL") &&
        nul.getMessage.contains(s"$fn("), s"$fn null: ${nul.getMessage}")
      // non-constant argument
      val nc = intercept[Exception](run(valid.dropRight(1) :+ "rand()"))
      assert(nc.getMessage.contains("constant") &&
        nc.getMessage.contains(s"$fn("), s"$fn non-const: ${nc.getMessage}")
      // unknown table name (first arg)
      val unk = intercept[Exception](run("'tvf_no_such_table'" +: valid.tail))
      assert(unk.getMessage.contains("tvf_no_such_table"),
        s"$fn unknown table: ${unk.getMessage}")
    }
  }

  test("integer TVF args reject fractional values instead of truncating") {
    registered()
    // 2.9 parses as DECIMAL — the old coercion silently ran iters=2
    val frac = intercept[Exception](
      spark.sql("""SELECT * FROM graft_semantic_dedup('embeddings',
                   'vec_id', 'embedding', 8, 2.9, 0.35D)""").collect())
    assert(frac.getMessage.contains("integer") &&
      frac.getMessage.contains("2.9"), frac.getMessage)
    // and a fractional DOUBLE is rejected the same way
    val fracD = intercept[Exception](
      spark.sql("""SELECT * FROM graft_semantic_dedup('embeddings',
                   'vec_id', 'embedding', CAST(8.5 AS DOUBLE), 2, 0.35D)""").collect())
    assert(fracD.getMessage.contains("integer"), fracD.getMessage)
  }

  test("fit-backed TVFs cache their fit: re-resolving the same call builds zero new fits") {
    registered()
    // unique args so this test's first resolution is a genuine miss
    val sqlText = """SELECT * FROM graft_semantic_dedup('embeddings',
                     'vec_id', 'embedding', 8, 2, 0.41D) ORDER BY vec_id"""
    val b0 = graft.plans.LlmTableFunctions.fitBuilds.get
    val first = spark.sql(sqlText).collect()
    val b1 = graft.plans.LlmTableFunctions.fitBuilds.get
    assert(b1 == b0 + 1, s"first resolution must fit exactly once ($b0 -> $b1)")
    // second resolution: same text — EXECUTION may run jobs, but the
    // RESOLUTION must not refit (spark.sql analyzes eagerly, so the
    // TVF builder has run by the time sql() returns)
    val re = spark.sql(sqlText)
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b1,
      "second resolution refit instead of hitting the cache")
    assert(re.collect().toSeq == first.toSeq)
    // EXPLAIN over the call is also resolution — also free
    spark.sql(s"EXPLAIN $sqlText").collect()
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b1,
      "EXPLAIN refit instead of hitting the cache")
  }

  test("the fit cache keys on the table's resolved plan: a re-pointed view refits") {
    registered()
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_cache_probe AS
                 SELECT * FROM embeddings WHERE vec_id < 400""")
    val call = """SELECT count(*) AS n FROM graft_kmeans_assign(
                  'tvf_cache_probe', 'vec_id', 'embedding', 4, 1)"""
    val b0 = graft.plans.LlmTableFunctions.fitBuilds.get
    spark.sql(call).collect()
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 1)
    // same SQL text, same view NAME — but the view now resolves to a
    // different plan: serving the cached fit would be stale
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_cache_probe AS
                 SELECT * FROM embeddings WHERE vec_id < 300""")
    val n = spark.sql(call).collect().head.getLong(0)
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 2,
      "re-pointed view must refit, not serve the stale fit")
    assert(n == 300)
    // clearFitCache drops the session's entries: next call refits
    graft.plans.LlmTableFunctions.clearFitCache(spark)
    spark.sql(call).collect()
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 3)
  }

  test("graft_kmeans_fit2/assign2_with round-trip the TWO-LEVEL fit: == graft_semantic_dedup2") {
    registered()
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_rt_idx2 AS
                 SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id',
                                                 'embedding', 3, 3, 2)""")
    val direct = spark.sql("""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 3, 3, 2, 0.35D)
      ORDER BY vec_id""").collect()
    val viaFit = spark.sql("""
      SELECT * FROM graft_semantic_dedup2_with('embeddings', 'vec_id',
                                               'embedding', 'tvf_rt_idx2',
                                               0.35D)
      ORDER BY vec_id""").collect()
    assert(viaFit.toSeq == direct.toSeq)
    // assignment face agrees too (same composite cell ids)
    val a = spark.sql("""
      SELECT vec_id, cell_id
      FROM graft_kmeans_assign2_with('embeddings', 'vec_id', 'embedding',
                                     'tvf_rt_idx2')
      ORDER BY vec_id""").collect()
    assert(a.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      direct.map(r => (r.getLong(0), r.getLong(1))).toSeq)
    // contract violations are named: missing super row for a cell
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_bad_idx2 AS
                 SELECT * FROM tvf_rt_idx2 WHERE sub_id >= 0""")
    val bad = intercept[Exception](spark.sql("""
      SELECT * FROM graft_kmeans_assign2_with('embeddings', 'vec_id',
                                              'embedding', 'tvf_bad_idx2')""")
      .collect())
    assert(bad.getMessage.contains("sub_id = -1"), bad.getMessage)
  }

  test("graft_kmeans_assign_with round-trips the fit: == graft_kmeans_assign, zero fit jobs") {
    registered()
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_rt_cents AS
                 SELECT * FROM graft_kmeans_fit('embeddings', 'vec_id',
                                                'embedding', 8, 2)""")
    val direct = spark.sql("""
      SELECT vec_id, cell_id
      FROM graft_kmeans_assign('embeddings', 'vec_id', 'embedding', 8, 2)
      ORDER BY vec_id""").collect()
    val viaFit = spark.sql("""
      SELECT vec_id, cell_id
      FROM graft_kmeans_assign_with('embeddings', 'vec_id', 'embedding',
                                    'tvf_rt_cents')
      ORDER BY vec_id""").collect()
    assert(viaFit.toSeq == direct.toSeq)
    // a centroids table violating the (cell_id, centroid) contract is
    // refused with the contract named
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_bad_cents AS
                 SELECT 1 AS foo, 2 AS bar""")
    val bad = intercept[Exception](spark.sql("""
      SELECT * FROM graft_kmeans_assign_with('embeddings', 'vec_id',
                                             'embedding', 'tvf_bad_cents')""")
      .collect())
    assert(bad.getMessage.contains("cell_id") &&
      bad.getMessage.contains("centroid"), bad.getMessage)
    // an EMPTY centroids table is refused, not served as a 0-cell index
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_empty_cents AS
                 SELECT * FROM tvf_rt_cents WHERE cell_id < 0""")
    val empty = intercept[Exception](spark.sql("""
      SELECT * FROM graft_kmeans_assign_with('embeddings', 'vec_id',
                                             'embedding', 'tvf_empty_cents')""")
      .collect())
    assert(empty.getMessage.contains("empty"), empty.getMessage)
    // DUPLICATE cell_id rows are refused (ADVICE r15): they would make
    // the orderBy tie-order — hence the argmax tie-break — nondeterministic
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_dup_cents AS
                 SELECT * FROM tvf_rt_cents
                 UNION ALL SELECT * FROM tvf_rt_cents LIMIT 9""")
    val dup = intercept[Exception](spark.sql("""
      SELECT * FROM graft_kmeans_assign_with('embeddings', 'vec_id',
                                             'embedding', 'tvf_dup_cents')""")
      .collect())
    assert(dup.getMessage.contains("duplicate cell_id"), dup.getMessage)
    // ... and duplicate sub_id rows within a super cell on the
    // two-level face: they would silently shift the composite
    // super*stride+sub cell ids away from the fit contract
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_rt_idx2_dup_src AS
                 SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id',
                                                 'embedding', 3, 3, 2)""")
    spark.sql("""CREATE OR REPLACE TEMPORARY VIEW tvf_dup_idx2 AS
                 SELECT * FROM tvf_rt_idx2_dup_src
                 UNION ALL
                 SELECT * FROM tvf_rt_idx2_dup_src
                 WHERE super_id = 0 AND sub_id = 0""")
    val dup2 = intercept[Exception](spark.sql("""
      SELECT * FROM graft_kmeans_assign2_with('embeddings', 'vec_id',
                                              'embedding', 'tvf_dup_idx2')""")
      .collect())
    assert(dup2.getMessage.contains("duplicate sub_id"), dup2.getMessage)
  }

  test("a committed write evicts cached fits: INSERT refits without manual clear") {
    registered()
    val root = java.nio.file.Files.createTempDirectory("graft_tvf_inval").toString
    spark.conf.set("spark.sql.catalog.tvfcat",
      classOf[graft.plans.GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.tvfcat.root", root)
    spark.sql("CREATE NAMESPACE IF NOT EXISTS tvfcat.db")
    spark.sql("""CREATE TABLE tvfcat.db.emb AS
                 SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200""")
    val call = """SELECT count(*) AS n FROM graft_kmeans_assign(
                  'tvfcat.db.emb', 'vec_id', 'embedding', 4, 1)"""
    val b0 = graft.plans.LlmTableFunctions.fitBuilds.get
    assert(spark.sql(call).collect().head.getLong(0) == 200)
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 1)
    spark.sql(call).collect() // same call, same snapshot: cache hit
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 1)
    // the eviction machinery in isolation: a path-targeted invalidate
    // drops the entry even though the key (snapshot) is unchanged —
    // this is what the commit hook calls
    val path = graft.sources.Catalog.tablePath(root, "db", "emb")
    graft.plans.LlmTableFunctions.invalidateFitsForPath(path)
    spark.sql(call).collect()
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 2,
      "invalidateFitsForPath must evict the fit keyed on this table")
    // the full write path (VERDICT r15 #6): INSERT commits through
    // IcebergLite.commitSnapshot, whose hook evicts — the next TVF
    // call must refit AND see the new rows, with no clearFitCache
    spark.sql("""INSERT INTO tvfcat.db.emb
                 SELECT vec_id, embedding FROM embeddings
                 WHERE vec_id >= 200 AND vec_id < 210""")
    assert(spark.sql(call).collect().head.getLong(0) == 210)
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 3,
      "a committed INSERT must refit without manual clearFitCache")
    // unrelated fits survive the targeted eviction
    val other = """SELECT count(*) AS n FROM graft_kmeans_assign(
                   'embeddings', 'vec_id', 'embedding', 4, 1)"""
    spark.sql(other).collect()
    val b1 = graft.plans.LlmTableFunctions.fitBuilds.get
    graft.plans.LlmTableFunctions.invalidateFitsForPath(path)
    spark.sql(other).collect()
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b1,
      "eviction must be confined to fits reading the written table")
    spark.sql("DROP TABLE tvfcat.db.emb")
  }

  test("a cells budget past MaxFitCells routes to the relation path instead of erroring") {
    registered()
    val over = Similarity.MaxFitCells / 2 + 1 // 2 * over > MaxFitCells
    // the self-contained dedup2 TVF: used to be refused by the
    // broadcast fit's guard, now runs through the relation-join path
    // (bit-identical semantics — RelIndexSpec) with the same contract
    val dedup = spark.sql(s"""
      SELECT * FROM graft_semantic_dedup2('embeddings', 'vec_id',
                                          'embedding', 2, $over, 1, 0.35D)
      ORDER BY vec_id""").collect()
    assert(dedup.nonEmpty)
    // fit2 past the ceiling returns the same relation contract (one
    // sub_id = -1 row per super; actual sub count is corpus-bounded)
    val fit = spark.sql(s"""
      SELECT * FROM graft_kmeans_fit2('embeddings', 'vec_id', 'embedding',
                                      2, $over, 1)""").collect()
    assert(fit.count(_.getInt(1) == -1) == 2)
    assert(fit.count(_.getInt(1) >= 0) >= 2)
  }

  test("eviction matches table paths on a boundary: /t1 never evicts /t10") {
    registered()
    val root = java.nio.file.Files.createTempDirectory("graft_tvf_sib").toString
    val emb = spark.table("embeddings").where("vec_id < 100")
    emb.write.parquet(s"$root/t1")
    emb.write.parquet(s"$root/t10")
    spark.read.parquet(s"$root/t1").createOrReplaceTempView("tvf_sib_t1")
    spark.read.parquet(s"$root/t10").createOrReplaceTempView("tvf_sib_t10")
    def fit(v: String) = spark.sql(
      s"SELECT count(*) AS n FROM graft_kmeans_assign('$v', 'vec_id', 'embedding', 4, 1)"
    ).collect()
    fit("tvf_sib_t1"); fit("tvf_sib_t10")
    val b0 = graft.plans.LlmTableFunctions.fitBuilds.get
    // a commit to …/t1 must NOT evict the sibling …/t10's fit (raw
    // string-prefix matching would — "t10".startsWith("t1"))
    graft.plans.LlmTableFunctions.invalidateFitsForPath(s"$root/t1")
    fit("tvf_sib_t10")
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0,
      "invalidate of …/t1 must leave the sibling …/t10 fit cached")
    fit("tvf_sib_t1")
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 1,
      "invalidate of …/t1 must evict the fit over …/t1 itself")
    // scheme-qualified rendering (file:///x vs /x) still evicts — the
    // staleness direction a raw stripPrefix("file:") would miss
    graft.plans.LlmTableFunctions.invalidateFitsForPath(s"file://$root/t10")
    fit("tvf_sib_t10")
    assert(graft.plans.LlmTableFunctions.fitBuilds.get == b0 + 2,
      "a file://-qualified table path must still evict the matching fit")
  }
}
