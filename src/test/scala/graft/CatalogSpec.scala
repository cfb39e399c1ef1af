package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every catalog query must run and keep a stable column set; entries
  * with oracles must name columns identically to their SQL (the driver
  * hash-compares by sorted column name). */
class CatalogSpec extends AnyFunSuite {
  import TestSpark._

  test("no duplicate query names and every oracle key exists") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
  }

  test("catalog size matches COVERAGE.md (catches silently dropped registrations)") {
    // update alongside COVERAGE.md's "Verification totals" when adding
    // queries (round-5 state was 158 + 156 ref_*; round 6 added
    // pq_encode / ann_pq_full / ann_pq_topk and the Iceberg write
    // family: iceberg_delete / overwrite / evolve / compact / expire /
    // merge / cluster, plus the stream_upsert CDC row, the
    // iceberg_incremental changelog row, the z-order cluster
    // rewrite, and the text_bm25 keyword-search row; round 7 added the
    // iceberg_orphan audit-GC row, the iceberg_cluster_quantile
    // rank-coded z-order row, the iceberg_rename column-rename row,
    // the iceberg_tag_travel ref-through-GC row, and the
    // iceberg_delete_mor merge-on-read delete row → 177 non-ref).
    // The ref_* rows exist only when a reference checkout is mounted
    // (they read its manifest at runtime), so count them conditionally.
    // round 8 closed the last 5 no_oracle rows (the ann_*_topk
    // partial-probe quartet's DuckDB oracles re-derive the identical
    // deterministic approximate pipeline — centroid/plane/codebook
    // construction, cell assignment, probe selection — in SQL, so the
    // approximate top-k itself is value-checked; trino_statistical_fns
    // reads a committed expected-constants fixture) — EVERY catalog
    // row now has a hard oracle.
    // round 8 also added the iceberg_branch_write publish row, the
    // iceberg_delete_positions v2 position-delete row, the
    // iceberg_history observability row, and the
    // iceberg_hidden_partition partition-transform row, plus the
    // iceberg_files_meta / iceberg_partitions_meta metadata-table
    // rows, the iceberg_spec_evolution row, the iceberg_compact_small
    // size-aware-compaction row, the iceberg_merge_cdc tombstone-merge
    // row, and the iceberg_refs_meta metadata-table row → 187.
    // round 9 added the iceberg_delete_eq equality-delete-file row, the
    // iceberg_widen type-widening row, the func_struct / func_map
    // nested-type rows, the trino_approx_pctl_sketch banded-sketch row,
    // and the stream_upsert_branch write-audit-publish row, plus the
    // iceberg_delete_files_meta delete-debt metadata-table row, the
    // iceberg_meta_columns _file/_pos row, and the
    // iceberg_rewrite_manifests metadata-maintenance row → 196.
    // round 10 added the iceberg_struct_evolution nested-evolution
    // row, the iceberg_column_stats NDV-sketch metadata-table row, and
    // the trino_approx_ndv_sketch HLL-banded row, and the
    // iceberg_changelog CDC-out row and the
    // iceberg_rollback_cherrypick history-surgery row, and the
    // stream_changelog_tail CDC-out consumer row and the
    // iceberg_manifests_meta metadata-table row, and the
    // iceberg_catalog metastore-surface row, and the
    // iceberg_predicate_pushdown readWhere row → 205, and the
    // iceberg_sql_catalog SQL-surface row (DDL + INSERT + time travel
    // + WHERE-driven file pruning through the session extensions)
    // → 206, and the iceberg_sql_dml row (UPDATE / both DELETE
    // routes / MERGE INTO with tombstones through pure SQL) → 207,
    // and the iceberg_rest_catalog REST-metastore row (the reference
    // client's endpoint/response/retry/branch-scope contract over the
    // file catalog) → 208, and the iceberg_sql_procedures row
    // (CALL graft.system.* maintenance procedures on Spark 4's
    // ProcedureCatalog API) → 209, and the text_chunks
    // overlapping-window chunking row (RAG preprocessing) → 210, and
    // the iceberg_sql_meta_tables 4-part-name observability row → 211.
    // round 11 added the iceberg_sql_merge_expr column-level-MERGE row
    // (UPDATE SET col = expr + differently-named ON keys) → 212, and
    // the iceberg_rest_branch REST branch-write row (fork → branch
    // commit → fast-forward merge to main) → 213, and the
    // iceberg_sql_struct_evolution nested-DDL row (ADD COLUMNS s.x /
    // ALTER COLUMN s.x TYPE as single metadata commits) → 214, and the
    // stream_sql_upsert SQL-declared streaming-CDC row (MERGE INTO
    // string driving foreachBatch, checkpoint kill-restart) → 215, and
    // the iceberg_count_meta metadata-COUNT(*) row (manifest-list
    // totals answer an unfiltered count with no scan; a pending MoR
    // delete flips it back to a scanning plan) → 216, and the
    // iceberg_sql_insert_cols explicit-column-list INSERT row
    // (positional map onto the listed columns, null-fill) → 217, and
    // the iceberg_sql_view persisted-view row (CREATE VIEW stores
    // text+schema, unqualified names scope to the view's database,
    // views nest and track the live table) → 218, and the
    // iceberg_sql_delete_in row (DELETE WHERE key IN (subquery) as a
    // merge-on-read equality delete: no target scan, no rewrite) → 219,
    // and the iceberg_sql_update_in row (UPDATE WHERE key IN (subquery)
    // as the update-only expr-merge, duplicate keys deduped) → 220.
    // round 13 added the cluster_kmeans Lloyd-assignment row (DuckDB
    // re-runs the whole quantized-mean fit) → 221, and the
    // dedup_semantic SemDeDup row (within-cell cosine dedup with
    // smallest lower-id witness) → 222, and the trino_hash_duration
    // row (murmur3 + parse_duration — declared-but-NotImplemented in
    // the reference, implemented here against an independent Python
    // fixture) → 223.
    // round 14 added the TVF SQL faces for the LLM operators
    // (plans/LlmTableFunctions.scala): sql_tvf_dedup_exact,
    // sql_tvf_semantic_dedup, sql_tvf_ann_topk — each under the SAME
    // oracle as its library-API row → 226; then the remaining
    // relation-producing dedup paths (sql_tvf_minhash_pairs,
    // sql_tvf_simhash_pairs, sql_tvf_dedup_clusters) → 229; then
    // dedup_semantic2 (two-level SemDeDup with the full IMI fit
    // re-derived in DuckDB) plus its TVF face and the kmeans-assign
    // TVF face (sql_tvf_semantic_dedup2, sql_tvf_kmeans_assign) → 232.
    // round 15 added the fit-once-serve-many seam (sql_tvf_kmeans_fit
    // materializing the Lloyd fit as a relation, plus
    // sql_tvf_kmeans_assign_with / sql_tvf_semantic_dedup_with serving
    // the prefitted centroids under the self-contained rows' oracles)
    // → 235, and the LSH-union recall-recovery pair
    // (dedup_semantic2_union + sql_tvf_semantic_dedup2_union, both
    // re-deriving the two-level fit AND the MD5-Rademacher LSH
    // witnesses in DuckDB) → 237, and the TWO-LEVEL fit-once seam
    // (sql_tvf_kmeans_fit2 materializing the IMI fit as a relation,
    // sql_tvf_kmeans_assign2_with / sql_tvf_semantic_dedup2_with
    // serving it) → 240, and the relation-indexed two-level path
    // (dedup_semantic2_rel — distributed fit + join assignment under
    // the same independent DuckDB re-derivation) → 241.
    val refN = if (queries.RefManifest.available) 156 else 0
    assert(SparkEntry.queries.size == 241 + refN, s"queries: ${SparkEntry.queries.size}")
    assert(SparkEntry.oracleSql.size == 241 + refN, s"oracles: ${SparkEntry.oracleSql.size}")
    val rowsOnly = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(rowsOnly.isEmpty, s"rows-only: $rowsOnly")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf0001)
      val n = df.count()
      assert(n >= 0)
      assert(df.columns.nonEmpty)
    }
  }

  test("entry returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
