package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

import graft.Engine
import graft.operators.Dedup
import graft.streaming.EventStream
import graft.streaming.EventStream._

/** Structured-Streaming rows of the catalog: each entry runs a REAL
  * streaming query — file source over the events parquet → transform →
  * memory sink, driven to completion with `processAllAvailable` — and
  * returns the finished table, so the driver's DuckDB oracle
  * hash-checks streaming output against its batch-SQL equivalent.
  *
  * The reference has no event-time streaming at all (SURVEY §2.10: its
  * "streaming" is volcano-style batch pull, plan.rs:12); these rows
  * prove the incremental forms produce byte-identical answers to the
  * batch semantics a reference user gets today.
  *
  * Determinism notes (why these are oracle-safe):
  *  - session tz is UTC and ts is NTZ-repaired, so the LTZ casts
  *    watermarks require are micros-identity;
  *  - the file source lists the single events parquet as ONE
  *    micro-batch (no maxFilesPerTrigger), so stateful results don't
  *    depend on batch boundaries;
  *  - sums accumulate in DECIMAL(18,6) (streaming state merges in
  *    arrival order — a double sum would be run-dependent);
  *  - `stream_window_agg`/`stream_session_window` mirror append-mode
  *    watermark semantics in SQL: a window/session is emitted iff
  *    `end <= ms_trunc(max(ts)) - delay` — inclusive boundary,
  *    millisecond-truncated watermark, both pinned empirically in
  *    WatermarkBoundarySpec (the no-data batch after the last file
  *    flushes exactly those).
  */
object StreamingQueries extends QueryCatalog {

  /** Streaming exact dedup (`dropDuplicatesWithinWatermark`) over the
    * stream unioned with itself: every event arrives twice, the state
    * store must emit each event_id exactly once. Only the id column is
    * emitted — WHICH duplicate survives is racy, the id set is not. */
  private val streamDedupIds = Q(
    "stream_dedup_ids",
    Some("SELECT DISTINCT event_id FROM events"),
    (s, dir) => {
      val ev = eventsStream(s, dir)
      runToMemory(dedupStream(ev.union(ev)).select("event_id"),
        "stream_dedup_ids_sink")
    })

  /** Watermarked stream-stream inner join (clicks⋈views per user within
    * 30 min) vs the plain batch range self-join. Ids only: the joined
    * set is deterministic, row multiplicity included. */
  private val streamJoinClickView = Q(
    "stream_join_click_view",
    Some("""
      SELECT c.event_id AS click_id, v.event_id AS view_id,
             c.user_id AS user_id
      FROM events c JOIN events v ON c.user_id = v.user_id
      WHERE c.event_type = 'click' AND v.event_type = 'view'
        AND v.ts <= c.ts AND v.ts >= c.ts - INTERVAL 30 MINUTE"""),
    (s, dir) =>
      runToMemory(
        clickViewJoin(eventsStream(s, dir))
          .select(col("click_id"), col("view_id"), col("c_user").as("user_id")),
        "stream_join_click_view_sink"))

  /** Stateful sessionization (mapGroupsWithState, 30-min gap): the last
    * session's event count + whether any earlier session closed, per
    * user. The batch oracle rebuilds the same gap logic with window
    * functions (ts ties are harmless: a zero gap can't break a session
    * whichever side of the tie is scanned first). */
  private val streamSessionize = Q(
    "stream_sessionize",
    Some("""
      WITH o AS (
        SELECT user_id, ts,
               CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                         > INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS brk
        FROM events),
      s AS (
        SELECT user_id,
               sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS sess
        FROM o),
      m AS (SELECT user_id, max(sess) AS last_sess FROM s GROUP BY user_id)
      SELECT s.user_id, count(*) AS n_events, (m.last_sess > 0) AS closed
      FROM s JOIN m ON s.user_id = m.user_id AND s.sess = m.last_sess
      GROUP BY s.user_id, m.last_sess"""),
    (s, dir) => {
      import s.implicits._
      val ev = eventsStream(s, dir)
        .select(col("user_id"), col("ts").cast("timestamp").as("ts"),
          col("event_type"))
        .as[EventStream.Event]
      runToMemory(
        sessionize(ev, gapMs = 30L * 60 * 1000)
          .toDF("user_id", "n_events", "closed"),
        "stream_sessionize_sink", OutputMode.Update())
    })

  /** Watermarked hourly window aggregation in APPEND mode: the sink
    * holds exactly the finalized windows — end ≤ the watermark, which
    * Spark tracks at MILLISECOND precision (max event time is
    * ms-truncated before the delay is subtracted), and the boundary is
    * INCLUSIVE: a window ending exactly on the watermark is emitted.
    * Both facts are pinned empirically in WatermarkBoundarySpec; the
    * oracle cut mirrors them with date_trunc('milliseconds', max(ts))
    * (for hour-aligned window ends the truncation cannot change the
    * answer, but the cut is exact by construction, not by luck). */
  private val streamWindowAgg = Q(
    "stream_window_agg",
    Some("""
      WITH mx AS (SELECT date_trunc('milliseconds', max(ts)) AS m FROM events)
      SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS window_start,
             event_type, count(*) AS n,
             round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
      FROM events, mx
      WHERE date_trunc('hour', ts) + INTERVAL 1 HOUR <= m - INTERVAL 2 HOUR
      GROUP BY date_trunc('hour', ts), event_type"""),
    (s, dir) =>
      runToMemory(windowedCounts(eventsStream(s, dir)), "stream_window_agg_sink")
        .select(col("window_start").cast("timestamp_ntz").as("window_start"),
          col("event_type"), col("n"),
          round(col("sum_value").cast("double"), 2).as("sum_value")))

  /** NATIVE gap-based session windows (merging-sessions state store, a
    * different operator than the mapGroupsWithState row): per-user
    * 30-min-gap sessions with counts + decimal sums; append mode emits
    * a session once the watermark passes its end. The oracle rebuilds
    * the same islands with window functions (boundary caveat: the SQL
    * breaks a session when the gap EXCEEDS 30 min, Spark when it
    * reaches it — they differ only on an exact-to-the-µs 30-min gap,
    * which this testdata cannot produce) and applies the same
    * horizon cut: `session_end ≤ watermark`, INCLUSIVE, against the
    * MS-TRUNCATED max event time (WatermarkBoundarySpec pins both;
    * session ends carry µs, so the ms truncation is load-bearing here
    * — a session ending µs above the truncated watermark is held
    * back even when the raw µs max(ts) − 2 h would pass it). */
  private val streamSessionWindow = Q(
    "stream_session_window",
    Some("""
      WITH mx AS (SELECT date_trunc('milliseconds', max(ts)) AS m FROM events),
      o AS (SELECT user_id, ts, value,
              CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                        > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
            FROM events),
      s AS (SELECT user_id, ts, value,
              sum(brk) OVER (PARTITION BY user_id ORDER BY ts
                             ROWS UNBOUNDED PRECEDING) AS sess
            FROM o),
      g AS (SELECT user_id, min(ts) AS session_start,
              max(ts) + INTERVAL 30 MINUTE AS session_end,
              count(*) AS n,
              round(CAST(sum(CAST(value AS DECIMAL(18,6))) AS DOUBLE), 2) AS sum_value
            FROM s GROUP BY user_id, sess)
      SELECT CAST(session_start AS TIMESTAMP) AS session_start,
             CAST(session_end AS TIMESTAMP) AS session_end,
             user_id, n, sum_value
      FROM g, mx
      WHERE session_end <= m - INTERVAL 2 HOUR"""),
    (s, dir) =>
      runToMemory(sessionWindowCounts(eventsStream(s, dir)),
        "stream_session_window_sink")
        .select(col("session_start").cast("timestamp_ntz").as("session_start"),
          col("session_end").cast("timestamp_ntz").as("session_end"),
          col("user_id"), col("n"),
          round(col("sum_value").cast("double"), 2).as("sum_value")))

  /** Streaming ingest dedup end-to-end: new docs (id ≥ 400) arrive as a
    * STREAM, LSH-band candidates against the static corpus (id < 400)
    * via the stateless stream-static inner join, then the finished
    * candidate set is exact-Jaccard verified in batch. The oracle is
    * the exact cross-table Jaccard — the SAME oracle as the all-batch
    * `dedup_incremental` row (banding recall ≈ 1 at this data's
    * similarity gap), so streaming ingest is proven to admit exactly
    * the pairs the batch path admits. */
  private val streamIngestDedup = Q(
    "stream_ingest_dedup",
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
      val docs = Engine.t(s, dir, "documents")
      val corpus = docs.filter(col("doc_id") < 400)
      val cands = runToMemory(
        ingestDedupPairsStream(
          tableStream(s, dir, "documents").filter(col("doc_id") >= 400), corpus),
        "stream_ingest_dedup_sink").distinct()
      Dedup.verifyCrossPairs(cands, docs.filter(col("doc_id") >= 400), corpus,
          col("doc_id"), col("text"), n = 3, threshold = 0.5)
        .orderBy(col("new_id"), col("corpus_id"))
    })

  private lazy val upsertRoot = java.nio.file.Files
    .createTempDirectory("graft_stream_upsert_row")

  /** Streaming CDC upsert into an IcebergLite table (foreachBatch →
    * ordered merge, sequence = event_id): the finished TABLE must hold
    * exactly the max-event_id record per user — the same answer the
    * batch window-rank query gives. Replay idempotence and
    * batch-boundary independence are proven in SourcesSpec; this row
    * pins the end-to-end stream → lakehouse value path. */
  private val streamUpsert = Q(
    "stream_upsert",
    Some("""
      SELECT user_id, event_id, ts, event_type, value FROM (
        SELECT user_id, event_id, ts, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1 ORDER BY user_id"""),
    (s, dir) => {
      Engine.deleteRecursively(upsertRoot)
      val root = s"$upsertRoot/t"
      graft.sources.IcebergLite.createTable(root)
      upsertStream(eventsStream(s, dir), root, s"$upsertRoot/ckpt")
      graft.sources.IcebergLite.read(s, root)
        .select(col("user_id"), col("event_id"), col("ts"),
          col("event_type"), col("value"))
        .orderBy(col("user_id"))
    })

  private lazy val sqlUpsertRoot = java.nio.file.Files
    .createTempDirectory("graft_stream_sql_upsert_row")

  /** SQL-DRIVEN streaming CDC (r11, [[EventStream.sqlMergeStream]]):
    * the upsert is DECLARED as a MERGE INTO statement — per-batch
    * winner selection in a USING subquery over the batch view, ordered
    * upsert via `WHEN MATCHED AND s.event_id >= t.event_id` — and run
    * against every micro-batch through foreachBatch. The row feeds
    * HALF the events, stops the stream (kill), then feeds the rest and
    * RESTARTS from the same checkpoint: the finished table must hold
    * exactly the max-event_id record per user, the same oracle as the
    * programmatic `stream_upsert` row. */
  private val streamSqlUpsert = Q(
    "stream_sql_upsert",
    Some("""
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1 ORDER BY user_id"""),
    (s, dir) => {
      Engine.deleteRecursively(sqlUpsertRoot)
      val root = sqlUpsertRoot.toString
      graft.sources.Catalog.init(root)
      s.conf.set("spark.sql.catalog.graftscdc",
        classOf[graft.plans.GraftCatalogPlugin].getName)
      s.conf.set("spark.sql.catalog.graftscdc.root", root)
      s.sql("CREATE NAMESPACE IF NOT EXISTS graftscdc.db")
      s.sql("""CREATE TABLE graftscdc.db.state
               (user_id BIGINT, event_id BIGINT, event_type STRING, value DOUBLE)""")
      val ev = Engine.t(s, dir, "events")
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      val mid = ev.agg(((min(col("event_id")) + max(col("event_id"))) / 2)
        .cast("long")).head.getLong(0)
      val inDir = s"$root/in"
      ev.filter(col("event_id") <= mid).coalesce(1).write.parquet(inDir)
      val mergeSql = """
        MERGE INTO graftscdc.db.state AS t
        USING (SELECT user_id, event_id, event_type, value FROM (
                 SELECT *, row_number() OVER (PARTITION BY user_id
                                              ORDER BY event_id DESC) AS rn
                 FROM batch) WHERE rn = 1) AS s
        ON t.user_id = s.user_id
        WHEN MATCHED AND s.event_id >= t.event_id THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *"""
      def run(): Unit = EventStream.sqlMergeStream(
        s.readStream.schema(ev.schema).parquet(inDir), mergeSql, s"$root/ckpt")
      run() // half the input, then the stream STOPS (the kill)
      val path = graft.sources.Catalog.tablePath(root, "db", "state")
      require(graft.sources.IcebergLite.currentSnapshotId(path).nonEmpty,
        "first run must have committed merges before the kill")
      ev.filter(col("event_id") > mid).coalesce(1)
        .write.mode("append").parquet(inDir)
      run() // RESTART from the same checkpoint
      s.sql("""SELECT user_id, event_id, event_type, value
               FROM graftscdc.db.state ORDER BY user_id""")
    })

  private lazy val upsertBranchRoot = java.nio.file.Files
    .createTempDirectory("graft_stream_upsert_branch_row")

  /** BRANCH-SCOPED streaming CDC (r9) — write-audit-publish composed
    * end-to-end: every micro-batch merge commits onto branch `ingest`
    * while MAIN stays frozen at the seed snapshot (runtime-checked
    * mid-query, same discipline as `iceberg_branch_write`), an audit
    * read validates the branch, and ONE `fastForwardMain` flip
    * publishes the whole ingest atomically. The oracle is the batch
    * window-rank over events UNION the literal seed row — the
    * post-publish main read must equal it exactly. Checkpoint
    * kill-restart on the branch head is proven in SourcesSpec. */
  private val streamUpsertBranch = Q(
    "stream_upsert_branch",
    Some("""
      SELECT user_id, event_id, event_type, value FROM (
        SELECT user_id, event_id, event_type, value,
               row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        FROM events) WHERE rn = 1
      UNION ALL
      SELECT * FROM (VALUES (CAST(-1 AS BIGINT), CAST(-1 AS BIGINT), 'seed', CAST(0.0 AS DOUBLE)))
        t(user_id, event_id, event_type, value)
      ORDER BY user_id"""),
    (s, dir) => {
      import s.implicits._
      Engine.deleteRecursively(upsertBranchRoot)
      val root = s"$upsertBranchRoot/t"
      graft.sources.IcebergLite.createTable(root)
      // a branch needs a snapshot to cut from: seed with a sentinel row
      // no event ever upserts (ts pinned so the row is deterministic)
      graft.sources.IcebergLite.append(s, root,
        Seq((-1L, -1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
          "seed", 0.0)).toDF("user_id", "event_id", "ts", "event_type", "value")
          .withColumn("ts", col("ts").cast("timestamp_ntz")).coalesce(1))
      graft.sources.IcebergLite.createBranch(root, "ingest")
      val mainSnap = graft.sources.IcebergLite.currentSnapshotId(root).get
      upsertStream(eventsStream(s, dir), root, s"$upsertBranchRoot/ckpt",
        toBranch = Some("ingest"))
      // audit: main is untouched by the whole ingest until the publish
      require(graft.sources.IcebergLite.currentSnapshotId(root).contains(mainSnap),
        "branch CDC must not move main before publish")
      require(graft.sources.IcebergLite.read(s, root).count() == 1L,
        "main must still hold only the seed row")
      graft.sources.IcebergLite.fastForwardMain(root, "ingest")
      graft.sources.IcebergLite.read(s, root)
        .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
        .orderBy(col("user_id"))
    })

  private lazy val cdcOutRoot = java.nio.file.Files
    .createTempDirectory("graft_stream_cdc_out_row")

  /** CDC-OUT (r10) — the checkpointed changelog CONSUMER under a
    * VALUES oracle: a table lifecycle (seed, append, merge-update,
    * eq-delete) is tailed in micro-batch ticks; the first tick
    * initializes at-latest and emits NOTHING, each later tick delivers
    * exactly the commits since the checkpoint as tagged
    * inserts/deletes, and a caught-up tick delivers nothing. The
    * collected batch rows (with their tick ordinal) must match the
    * pinned per-commit change set — the consumer-side contract
    * ([[graft.streaming.EventStream.changelogTick]]'s at-least-once
    * crash replay is proven in SourcesSpec). */
  private val streamChangelogTail = Q(
    "stream_changelog_tail",
    Some("""
      SELECT * FROM (VALUES
        (1, CAST(2 AS BIGINT), 'b', 'insert'),
        (2, CAST(1 AS BIGINT), 'a', 'delete'),
        (2, CAST(1 AS BIGINT), 'A2', 'insert'),
        (2, CAST(3 AS BIGINT), 'c', 'insert'),
        (3, CAST(2 AS BIGINT), 'b', 'delete'))
        t(tick, id, v, _change_type)
      ORDER BY tick, _change_type, id"""),
    (s, _) => {
      import s.implicits._
      Engine.deleteRecursively(cdcOutRoot)
      val root = s"$cdcOutRoot/t"
      val ckpt = s"$cdcOutRoot/ckpt"
      graft.sources.IcebergLite.createTable(root)
      graft.sources.IcebergLite.append(s, root,
        Seq((1L, "a")).toDF("id", "v").coalesce(1))
      val got = scala.collection.mutable.ArrayBuffer.empty[(Int, Long, String, String)]
      var tick = 0
      def drain(): Unit = {
        tick += 1
        graft.streaming.EventStream.changelogTick(s, root, ckpt) { df =>
          got ++= df.select(col("id"), col("v"), col("_change_type")).collect()
            .map(r => (tick, r.getLong(0), r.getString(1), r.getString(2)))
        }
        ()
      }
      graft.streaming.EventStream.changelogTick(s, root, ckpt)(_ => ()) // init at latest
      graft.sources.IcebergLite.append(s, root,
        Seq((2L, "b")).toDF("id", "v").coalesce(1))
      drain() // tick 1: the append
      graft.sources.IcebergLite.merge(s, root,
        Seq((1L, "A2"), (3L, "c")).toDF("id", "v"), keyCols = Seq("id"))
      drain() // tick 2: update (delete+insert) + insert
      graft.sources.IcebergLite.deleteEquality(s, root, Seq(2L).toDF("id"))
      drain() // tick 3: the MoR delete
      drain() // tick 4: caught up — contributes nothing
      got.toSeq.toDF("tick", "id", "v", "_change_type")
        .orderBy(col("tick"), col("_change_type"), col("id"))
    })

  def defs: Seq[Q] = Seq(
    streamDedupIds, streamJoinClickView, streamSessionize, streamWindowAgg,
    streamIngestDedup, streamSessionWindow, streamUpsert, streamUpsertBranch,
    streamChangelogTail, streamSqlUpsert)
}
