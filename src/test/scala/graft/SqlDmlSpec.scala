package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftCatalogPlugin
import graft.sources.{Catalog, IcebergLite}

/** SQL DML over catalog tables (SqlCatalog.scala): DELETE (pruned
  * copy-on-write vs position-delete routing), UPDATE (copy-on-write,
  * partition moves), MERGE INTO (upsert / ordered upsert / tombstone
  * delete), TRUNCATE — all resolved through the session extensions
  * onto the table layer's snapshot commits. */
class SqlDmlSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_sqldml").toString
    spark.conf.set("spark.sql.catalog.dml", classOf[GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.dml.root", r)
    spark.sql("CREATE NAMESPACE dml.db")
    r
  }

  private def rows(sql: String): Seq[(Long, String, String)] =
    spark.sql(sql).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2))).toSeq

  test("DELETE with a translatable predicate prunes the rewrite; general predicates go merge-on-read") {
    root
    spark.sql("""CREATE TABLE dml.db.d (id BIGINT, p STRING, v STRING)
                 PARTITIONED BY (p)""")
    spark.sql("""INSERT INTO dml.db.d VALUES
      (1, 'a', 'keep'), (2, 'a', 'drop'), (3, 'b', 'keep'), (4, 'b', 'xx')""")
    val path = Catalog.tablePath(root, "db", "d")
    val files1 = IcebergLite.dataFiles(path).map(_.filePath).toSet

    // exact conjuncts → copy-on-write delete; partition b untouched
    spark.sql("DELETE FROM dml.db.d WHERE p = 'a' AND id = 2")
    val files2 = IcebergLite.dataFiles(path).map(_.filePath).toSet
    assert(files1.filter(_.contains("p=b")).subsetOf(files2),
      "partition b files must carry verbatim through a p='a' delete")
    assert(rows("SELECT id, p, v FROM dml.db.d ORDER BY id") ==
      Seq((1L, "a", "keep"), (3L, "b", "keep"), (4L, "b", "xx")))

    // untranslatable predicate (function) → position delete, zero rewrite
    spark.sql("DELETE FROM dml.db.d WHERE length(v) = 2")
    val files3 = IcebergLite.dataFiles(path).map(_.filePath).toSet
    assert(files3 == files2, "general-predicate delete must not rewrite files")
    assert(rows("SELECT id, p, v FROM dml.db.d ORDER BY id") ==
      Seq((1L, "a", "keep"), (3L, "b", "keep")))

    // DELETE without WHERE truncates (metadata-only)
    spark.sql("DELETE FROM dml.db.d")
    assert(spark.sql("SELECT count(*) AS n FROM dml.db.d")
      .collect().head.getLong(0) == 0)
  }

  test("DELETE matching zero rows commits no snapshot and leaves no delete-file dir") {
    root
    spark.sql("CREATE TABLE dml.db.z (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.z VALUES (1, 'a'), (2, 'b')")
    val path = Catalog.tablePath(root, "db", "z")
    val snapBefore = IcebergLite.currentSnapshotId(path)
    // untranslatable predicate → MoR position route, but nothing matches
    spark.sql("DELETE FROM dml.db.z WHERE length(v) = 99")
    assert(IcebergLite.currentSnapshotId(path) == snapBefore,
      "a zero-match delete must not commit a spurious snapshot")
    val dataDir = java.nio.file.Paths.get(path, "data")
    val leftover = java.nio.file.Files.list(dataDir).iterator()
    val posdels = Iterator.continually(leftover)
      .takeWhile(_.hasNext).map(_.next().getFileName.toString)
      .filter(_.startsWith("posdel-")).toSeq
    assert(posdels.isEmpty, s"empty posdel run dirs left behind: $posdels")
    assert(rows("SELECT id, v, v FROM dml.db.z ORDER BY id").map(_._1) ==
      Seq(1L, 2L))
  }

  test("UPDATE rewrites only touched partitions; assigned partition columns move rows") {
    root
    spark.sql("""CREATE TABLE dml.db.u (id BIGINT, p STRING, v STRING)
                 PARTITIONED BY (p)""")
    spark.sql("""INSERT INTO dml.db.u VALUES
      (1, 'a', 'x'), (2, 'a', 'y'), (3, 'b', 'z')""")
    val path = Catalog.tablePath(root, "db", "u")
    val before = IcebergLite.dataFiles(path).map(_.filePath).toSet

    spark.sql("UPDATE dml.db.u SET v = concat(v, '!') WHERE p = 'a' AND id = 2")
    val after = IcebergLite.dataFiles(path).map(_.filePath).toSet
    assert(before.filter(_.contains("p=b")).subsetOf(after),
      "partition b must carry verbatim through a p='a' update")
    assert(rows("SELECT id, p, v FROM dml.db.u ORDER BY id") ==
      Seq((1L, "a", "x"), (2L, "a", "y!"), (3L, "b", "z")))

    // moving a row across partitions: the partition column is assignable
    spark.sql("UPDATE dml.db.u SET p = 'b' WHERE id = 1")
    assert(rows("SELECT id, p, v FROM dml.db.u ORDER BY id") ==
      Seq((1L, "b", "x"), (2L, "a", "y!"), (3L, "b", "z")))
    val moved = IcebergLite.readWhere(spark, path,
      org.apache.spark.sql.functions.col("p") === "b")
    assert(moved.collect().map(_.getLong(0)).sorted.toSeq == Seq(1L, 3L))

    // expression over existing columns, unconditional
    spark.sql("UPDATE dml.db.u SET id = id + 100")
    assert(spark.sql("SELECT sum(id) AS s FROM dml.db.u")
      .collect().head.getLong(0) == 306L)
  }

  test("MERGE INTO: upsert, ordered upsert, tombstone routing, delete-only") {
    root
    spark.sql("CREATE TABLE dml.db.m (id BIGINT, v STRING, seq BIGINT)")
    spark.sql("INSERT INTO dml.db.m VALUES (1, 'one', 10), (2, 'two', 10)")

    // plain upsert: update matched, insert unmatched
    spark.sql("""
      MERGE INTO dml.db.m AS t
      USING (SELECT 2 AS id, 'TWO' AS v, 11 AS seq
             UNION ALL SELECT 3, 'three', 11) AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT id, v, cast(seq AS STRING) FROM dml.db.m ORDER BY id") ==
      Seq((1L, "one", "10"), (2L, "TWO", "11"), (3L, "three", "11")))

    // ordered upsert: stale sequence cannot clobber
    spark.sql("""
      MERGE INTO dml.db.m AS t
      USING (SELECT 2 AS id, 'stale' AS v, 5 AS seq) AS s
      ON t.id = s.id
      WHEN MATCHED AND s.seq >= t.seq THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT id, v, cast(seq AS STRING) FROM dml.db.m WHERE id = 2") ==
      Seq((2L, "TWO", "11")))

    // tombstone column routes per-row delete vs upsert
    spark.sql("""
      MERGE INTO dml.db.m AS t
      USING (SELECT 1 AS id, 'ONE' AS v, 12 AS seq, false AS dead
             UNION ALL SELECT 3, 'x', 12, true) AS s
      ON t.id = s.id
      WHEN MATCHED AND s.dead THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(rows("SELECT id, v, cast(seq AS STRING) FROM dml.db.m ORDER BY id") ==
      Seq((1L, "ONE", "12"), (2L, "TWO", "11")))

    // delete-only merge: matched keys die, unmatched no-op
    spark.sql("""
      MERGE INTO dml.db.m AS t
      USING (SELECT 2 AS id, 'zz' AS v, 0 AS seq
             UNION ALL SELECT 99, 'zz', 0) AS s
      ON t.id = s.id
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT id FROM dml.db.m").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
  }

  test("TRUNCATE TABLE keeps schema and history") {
    root
    spark.sql("CREATE TABLE dml.db.tr (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.tr VALUES (1, 'a'), (2, 'b')")
    val path = Catalog.tablePath(root, "db", "tr")
    val pre = IcebergLite.currentSnapshotId(path).get
    spark.sql("TRUNCATE TABLE dml.db.tr")
    assert(spark.sql("SELECT count(*) AS n FROM dml.db.tr")
      .collect().head.getLong(0) == 0)
    // prior snapshot still time-travelable; columns still resolvable
    assert(spark.sql(s"SELECT id FROM dml.db.tr VERSION AS OF $pre").count() == 2)
    assert(spark.sql("SELECT id, v FROM dml.db.tr").columns.toSeq == Seq("id", "v"))
  }

  test("write-audit-publish in SQL: branch INSERT + MERGE, fast_forward publish") {
    root
    spark.sql("CREATE TABLE dml.db.wap (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.wap VALUES (1, 'a')")
    spark.sql("CALL dml.system.create_branch('db.wap', 'audit')")
    // audit writes land on the branch; main is frozen
    spark.sql("INSERT INTO dml.db.wap.branch_audit VALUES (2, 'b')")
    spark.sql("""
      MERGE INTO dml.db.wap.branch_audit AS t
      USING (SELECT 2 AS id, 'B' AS v UNION ALL SELECT 3, 'c') AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) AS n FROM dml.db.wap")
      .collect().head.getLong(0) == 1)
    assert(spark.sql("SELECT id, v FROM dml.db.wap.branch_audit ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
    // publish: fast-forward main to the audited branch head
    spark.sql("CALL dml.system.fast_forward('db.wap', 'audit')")
    assert(spark.sql("SELECT count(*) AS n FROM dml.db.wap")
      .collect().head.getLong(0) == 3)
    // UPDATE/DELETE on a branch refuse with routing guidance
    val up = intercept[Exception](
      spark.sql("UPDATE dml.db.wap.branch_audit SET v = 'x' WHERE id = 1"))
    assert(up.getMessage.contains("branch"))
  }

  test("MERGE/INSERT sources that resolve late (views) still find their target") {
    root
    spark.sql("CREATE TABLE dml.db.late (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.late VALUES (1, 'a')")
    val s = spark
    import s.implicits._
    Seq((1L, "A"), (2L, "b")).toDF("id", "v").createOrReplaceTempView("late_src")
    // first analyzer pass sees an UNRESOLVED view source: the target
    // must be claimed as a write address, not resolved into a scan
    // unaliased target: the bare table name qualifies (SQL scoping)
    spark.sql("""
      MERGE INTO dml.db.late USING late_src AS s
      ON late.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    spark.sql("INSERT INTO dml.db.late SELECT id + 10, v FROM late_src")
    assert(spark.sql("SELECT id, v FROM dml.db.late ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A"), (2L, "b"), (11L, "A"), (12L, "b")))
  }

  test("MERGE with column-level SET expressions and differently-named ON keys") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.ex (ok BIGINT, amt DOUBLE, note STRING)")
    spark.sql("""INSERT INTO dml.db.ex VALUES
      (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 5.0, 'c')""")
    Seq((2L, 99.0, 7.0, "upd"), (4L, 1.5, 0.0, "new"))
      .toDF("o_key", "amt", "delta", "note").createOrReplaceTempView("ex_src")
    // arithmetic over BOTH sides + a function of a source column;
    // ON equates differently-named key columns
    spark.sql("""
      MERGE INTO dml.db.ex AS t USING ex_src AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.amt = t.amt + s.delta, t.note = upper(s.note)
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT ok, amt, note FROM dml.db.ex ORDER BY ok").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 10.0, "a"), (2L, 27.0, "UPD"), (3L, 5.0, "c"),
        (4L, 1.5, "new")))

    // update-only MERGE (no INSERT arm): unmatched source rows are
    // ignored, and the source needs only the columns it references
    Seq((1L, 100.0), (9L, 1000.0)).toDF("o_key", "delta")
      .createOrReplaceTempView("ex_src2")
    spark.sql("""
      MERGE INTO dml.db.ex AS t USING ex_src2 AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.amt = t.amt + s.delta""")
    assert(spark.sql("SELECT ok, amt FROM dml.db.ex ORDER BY ok").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 110.0), (2L, 27.0), (3L, 5.0), (4L, 1.5)))

    // expr-merge on a RENAMED column: assignment names arrive logical
    spark.sql("ALTER TABLE dml.db.ex RENAME COLUMN amt TO amount")
    spark.sql("""
      MERGE INTO dml.db.ex AS t USING ex_src2 AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.amount = t.amount + s.delta""")
    assert(spark.sql("SELECT amount FROM dml.db.ex WHERE ok = 1").collect()
      .head.getDouble(0) == 210.0)
  }

  test("column-level INSERT actions and insert-only MERGE") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.ci (ok BIGINT, amt DOUBLE, note STRING)")
    spark.sql("INSERT INTO dml.db.ci VALUES (1, 10.0, 'a')")
    Seq((1L, 5.0), (2L, 3.0)).toDF("o_key", "delta")
      .createOrReplaceTempView("ci_src")
    // INSERT (cols) VALUES (exprs): assigned columns evaluate over the
    // source, unassigned (note) null-fills
    spark.sql("""
      MERGE INTO dml.db.ci AS t USING ci_src AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.amt = t.amt + s.delta
      WHEN NOT MATCHED THEN INSERT (ok, amt) VALUES (s.o_key, s.delta * 2)""")
    assert(spark.sql("SELECT ok, amt, note FROM dml.db.ci ORDER BY ok").collect()
      .map(r => (r.getLong(0), r.getDouble(1),
        if (r.isNullAt(2)) "-" else r.getString(2))).toSeq ==
      Seq((1L, 15.0, "a"), (2L, 6.0, "-")))

    // INSERT-ONLY MERGE (dedup-insert): existing keys are skipped and
    // NO live file is rewritten — the whole commit is carried files +
    // the new rows
    val path = Catalog.tablePath(root, "db", "ci")
    val before = IcebergLite.dataFiles(path).map(_.filePath).toSet
    Seq((2L, 99.0, "dup"), (3L, 30.0, "new")).toDF("ok", "amt", "note")
      .createOrReplaceTempView("ci_src2")
    spark.sql("""
      MERGE INTO dml.db.ci AS t USING ci_src2 AS s
      ON t.ok = s.ok
      WHEN NOT MATCHED THEN INSERT *""")
    val after = IcebergLite.dataFiles(path).map(_.filePath).toSet
    assert(before.subsetOf(after), "insert-only MERGE must rewrite no live file")
    assert(spark.sql("SELECT ok, amt FROM dml.db.ci ORDER BY ok").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      Seq((1L, 15.0), (2L, 6.0), (3L, 30.0)),
      "existing key 2 must keep its stored row")

    // refusals: conditional INSERT, star-update + column insert,
    // target reference in an INSERT value
    val condIns = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.ci AS t USING ci_src AS s
      ON t.ok = s.o_key
      WHEN NOT MATCHED AND s.delta > 0 THEN INSERT (ok) VALUES (s.o_key)"""))
    assert(condIns.getMessage.contains("conditional INSERT"))
    val starMix = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.ci AS t USING ci_src2 AS s
      ON t.ok = s.ok
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT (ok) VALUES (s.ok)"""))
    assert(starMix.getMessage.contains("not with UPDATE SET *"))
    val tgtRef = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.ci AS t USING ci_src AS s
      ON t.ok = s.o_key
      WHEN NOT MATCHED THEN INSERT (ok, amt) VALUES (s.o_key, t.amt)"""))
    assert(tgtRef.getMessage.contains("source columns only"))
  }

  test("WHEN NOT MATCHED BY SOURCE THEN DELETE: the snapshot-sync MERGE") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.sync (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.sync VALUES (1, 'old1'), (2, 'old2'), (3, 'old3')")
    Seq((2L, "new2"), (4L, "new4")).toDF("id", "v")
      .createOrReplaceTempView("sync_src")
    // full sync: matched update, unmatched insert, by-source delete —
    // the table becomes exactly the source state
    spark.sql("""
      MERGE INTO dml.db.sync AS t USING sync_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT id, v FROM dml.db.sync ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((2L, "new2"), (4L, "new4")))
    // delete-only by-source form: prune to the source's key set
    Seq(Tuple1(4L)).toDF("id").createOrReplaceTempView("sync_keep")
    spark.sql("""
      MERGE INTO dml.db.sync AS t USING sync_keep AS s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE THEN DELETE""")
    assert(spark.sql("SELECT id, v FROM dml.db.sync").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((4L, "new4")))
    // history intact: time travel still sees the pre-sync table
    val path = Catalog.tablePath(root, "db", "sync")
    val first = IcebergLite.snapshots(path).min
    assert(spark.sql(
      s"SELECT count(*) AS n FROM dml.db.sync VERSION AS OF $first")
      .collect().head.getLong(0) == 3)
    // refusal: conditional by-source delete
    val cond = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.sync AS t USING sync_keep AS s
      ON t.id = s.id
      WHEN NOT MATCHED BY SOURCE AND t.id > 0 THEN DELETE"""))
    assert(cond.getMessage.contains("THEN DELETE only"))
  }

  test("expr-MERGE refusals: conditions, mixed arms, duplicate SET, key collisions") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.exr (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.exr VALUES (1, 1.0)")
    Seq((1L, 2.0, false)).toDF("id", "v", "dead")
      .createOrReplaceTempView("exr_src")
    val cond = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.exr AS t USING exr_src AS s
      ON t.id = s.id
      WHEN MATCHED AND s.v > 0 THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(cond.getMessage.contains("conditional UPDATE"))
    val mixed = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.exr AS t USING exr_src AS s
      ON t.id = s.id
      WHEN MATCHED AND s.dead THEN DELETE
      WHEN MATCHED THEN UPDATE SET t.v = s.v + 1
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(mixed.getMessage.contains("cannot combine"))
    val dup = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.exr AS t USING exr_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET t.v = s.v, t.v = s.v + 1
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(dup.getMessage.contains("same column twice"))
    // renaming the source key to the target name must not shadow an
    // existing source column
    Seq((1L, 5L, 2.0)).toDF("id", "k", "v").createOrReplaceTempView("exr_src2")
    val clash = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.exr AS t USING exr_src2 AS s
      ON t.id = s.k
      WHEN MATCHED THEN UPDATE SET t.v = s.v
      WHEN NOT MATCHED THEN INSERT *"""))
    assert(clash.getMessage.contains("already has"))
    // star-update without INSERT still refuses (replace semantics)
    val star = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.exr AS t USING exr_src AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *"""))
    assert(star.getMessage.contains("INSERT"))
  }

  test("DELETE WHERE key IN (subquery) routes to an equality delete") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.din (id BIGINT, v STRING)")
    spark.sql("""INSERT INTO dml.db.din VALUES
      (1, 'a'), (2, 'b'), (3, 'c'), (4, 'd')""")
    spark.sql("CREATE TABLE dml.db.dead (id BIGINT)")
    spark.sql("INSERT INTO dml.db.dead VALUES (2), (4), (99)")
    val path = graft.sources.Catalog.tablePath(root, "db", "din")
    val filesBefore = graft.sources.IcebergLite.dataFiles(path).map(_.filePath).toSet
    spark.sql("""DELETE FROM dml.db.din
      WHERE id IN (SELECT id FROM dml.db.dead)""")
    assert(spark.sql("SELECT id FROM dml.db.din ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 3L))
    // the route is merge-on-read: every pre-delete data file survives
    // (no rewrite), the kill is an equality-delete file
    val filesAfter = graft.sources.IcebergLite.dataFiles(path).map(_.filePath).toSet
    assert(filesBefore.subsetOf(filesAfter), "IN-delete must not rewrite data files")
    assert(graft.sources.IcebergLite.eqDeletes(path).nonEmpty)
    // multi-column IN and a non-column key both behave
    spark.sql("CREATE TABLE dml.db.din2 (a BIGINT, b STRING)")
    spark.sql("INSERT INTO dml.db.din2 VALUES (1, 'x'), (1, 'y'), (2, 'x')")
    spark.sql("""DELETE FROM dml.db.din2
      WHERE (a, b) IN (SELECT 1, 'x')""")
    assert(spark.sql("SELECT a, b FROM dml.db.din2 ORDER BY a, b").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "y"), (2L, "x")))
    val bad = intercept[Exception](spark.sql("""DELETE FROM dml.db.din2
      WHERE (a + 1) IN (SELECT 1)"""))
    assert(bad.getMessage.contains("plain key columns"))
    // a typo'd key column must refuse BEFORE committing: an eq-delete
    // file keyed on a nonexistent column would fail every later read
    val snapBefore = graft.sources.IcebergLite.currentSnapshotId(
      graft.sources.Catalog.tablePath(root, "db", "din2"))
    val typo = intercept[Exception](spark.sql("""DELETE FROM dml.db.din2
      WHERE aa IN (SELECT 1)"""))
    assert(typo.getMessage.contains("not in the table"))
    assert(graft.sources.IcebergLite.currentSnapshotId(
      graft.sources.Catalog.tablePath(root, "db", "din2")) == snapBefore,
      "the refused delete must not commit")
    assert(spark.sql("SELECT count(*) AS c FROM dml.db.din2")
      .collect().head.getLong(0) == 2L)
  }

  test("UPDATE WHERE key IN (subquery) routes to the update-only expr-merge") {
    root
    val s = spark
    import s.implicits._
    spark.sql("""CREATE TABLE dml.db.uin (id BIGINT, amt DOUBLE, note STRING)""")
    spark.sql("""INSERT INTO dml.db.uin VALUES
      (1, 10.0, 'a'), (2, 20.0, 'b'), (3, 30.0, 'c')""")
    spark.sql("CREATE TABLE dml.db.bump (id BIGINT)")
    // duplicate keys in the subquery: IN is set membership, not a join
    spark.sql("INSERT INTO dml.db.bump VALUES (1), (1), (3), (99)")
    spark.sql("""UPDATE dml.db.uin SET amt = amt * 2, note = upper(note)
      WHERE id IN (SELECT id FROM dml.db.bump)""")
    assert(spark.sql("SELECT id, amt, note FROM dml.db.uin ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSeq ==
      Seq((1L, 20.0, "A"), (2L, 20.0, "b"), (3L, 60.0, "C")))
    // typo'd key refuses before any commit
    val typo = intercept[Exception](spark.sql("""UPDATE dml.db.uin SET amt = 0
      WHERE idd IN (SELECT id FROM dml.db.bump)"""))
    assert(typo.getMessage.contains("not in the table"))
  }

  test("a source column named 'matched' is DATA, not the join marker") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.mk (ok BIGINT, done BOOLEAN, n BIGINT)")
    spark.sql("INSERT INTO dml.db.mk VALUES (1, false, 0), (2, false, 0), (3, true, 5)")
    // row 2 IS matched by key but carries matched=false — a marker
    // named __graft_s_ + "matched" would overwrite it with constant
    // true and silently commit done=true
    Seq((1L, true, 10L), (2L, false, 20L)).toDF("o_key", "matched", "n")
      .createOrReplaceTempView("mk_src")
    spark.sql("""
      MERGE INTO dml.db.mk AS t USING mk_src AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.done = s.matched, t.n = s.n""")
    assert(spark.sql("SELECT ok, done, n FROM dml.db.mk ORDER BY ok").collect()
      .map(r => (r.getLong(0), r.getBoolean(1), r.getLong(2))).toSeq ==
      Seq((1L, true, 10L), (2L, false, 20L), (3L, true, 5L)))
    // the reserved namespace itself refuses up front
    Seq((1L, 9L)).toDF("o_key", "__graft_x").createOrReplaceTempView("mk_bad")
    val e = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.mk AS t USING mk_bad AS s
      ON t.ok = s.o_key
      WHEN MATCHED THEN UPDATE SET t.n = s.`__graft_x`"""))
    assert(e.getMessage.contains("__graft_"))
  }

  test("sqlMergeStream validates the statement shape BEFORE the stream starts") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.scdc (id BIGINT, v STRING)")
    val in = java.nio.file.Files.createTempDirectory("graft_scdc_in")
      .resolve("in").toString
    Seq((1L, "a")).toDF("id", "v").write.parquet(in)
    val schema = spark.read.parquet(in).schema
    def stream() = spark.readStream.schema(schema).parquet(in)
    // NOT MATCHED BY SOURCE is an unsupported shape: it must refuse at
    // DECLARATION (no checkpoint dir is ever created)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_scdc_ckpt")
      .resolve("c1").toString
    val bad = intercept[Exception](graft.streaming.EventStream.sqlMergeStream(
      stream(), """
        MERGE INTO dml.db.scdc AS t USING batch AS s
        ON t.id = s.id
        WHEN MATCHED THEN UPDATE SET *
        WHEN NOT MATCHED THEN INSERT *
        WHEN NOT MATCHED BY SOURCE THEN DELETE""", ckpt))
    assert(bad.getMessage.contains("NOT MATCHED BY SOURCE"))
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(ckpt)),
      "a refused statement must not have started the stream")
    // a non-MERGE statement and a multi-view USING refuse too
    val notMerge = intercept[Exception](graft.streaming.EventStream.sqlMergeStream(
      stream(), "SELECT 1", ckpt))
    assert(notMerge.getMessage.contains("MERGE INTO"))
    // the happy path streams the batch through the statement
    graft.streaming.EventStream.sqlMergeStream(stream(), """
      MERGE INTO dml.db.scdc AS t USING batch AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""", ckpt)
    assert(spark.sql("SELECT id, v FROM dml.db.scdc").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq == Seq((1L, "a")))
  }

  test("unsupported DML shapes refuse with actionable messages") {
    root
    spark.sql("CREATE TABLE dml.db.r (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.r VALUES (1, 'a')")
    // IN (subquery) is supported (equality-delete route); OTHER
    // subquery shapes still refuse with the pointer message
    val sub = intercept[Exception](spark.sql(
      "DELETE FROM dml.db.r WHERE EXISTS (SELECT 1)"))
    assert(sub.getMessage.contains("subqueries"))
    val notIn = intercept[Exception](spark.sql(
      "DELETE FROM dml.db.r WHERE id NOT IN (SELECT 1)"))
    assert(notIn.getMessage.contains("subqueries"))
    val nmbs = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.r AS t USING (SELECT 1 AS id, 'x' AS v) AS s
      ON t.id = s.id
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *
      WHEN NOT MATCHED BY SOURCE THEN DELETE"""))
    assert(nmbs.getMessage.contains("NOT MATCHED BY SOURCE"))
  }

  test("MERGE SET refuses an unqualified name that lives on both sides") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.amb (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.amb VALUES (1, 1.0)")
    Seq((1L, 2.0)).toDF("id", "v").createOrReplaceTempView("amb_src")
    // `SET v = v` with v on BOTH sides would silently self-assign the
    // target column and commit unchanged data — Spark raises
    // AMBIGUOUS_REFERENCE here and so do we
    val amb = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.amb AS t USING amb_src AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET v = v"""))
    assert(amb.getMessage.contains("ambiguous"), amb.getMessage)
    // nothing committed by the refused statement
    assert(spark.sql("SELECT v FROM dml.db.amb").collect().head.getDouble(0) == 1.0)
    // qualifying both sides resolves it
    spark.sql("""
      MERGE INTO dml.db.amb AS t USING amb_src AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET t.v = src.v""")
    assert(spark.sql("SELECT v FROM dml.db.amb").collect().head.getDouble(0) == 2.0)
    // a source-ONLY unqualified name is not ambiguous (analyzer
    // resolves it to the source before the check runs)
    Seq((1L, 5.0)).toDF("id", "delta").createOrReplaceTempView("amb_src2")
    spark.sql("""
      MERGE INTO dml.db.amb AS t USING amb_src2 AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET t.v = delta""")
    assert(spark.sql("SELECT v FROM dml.db.amb").collect().head.getDouble(0) == 5.0)
    // case-variant references land like Spark's resolver would:
    // DELTA = delta, and a case-variant spelling of a RENAMED source
    // key still routes through the rename (O_KEY -> target name id)
    Seq((1L, 9.0)).toDF("o_key", "delta").createOrReplaceTempView("amb_src3")
    spark.sql("""
      MERGE INTO dml.db.amb AS t USING amb_src3 AS src
      ON t.id = src.o_key
      WHEN MATCHED THEN UPDATE SET t.v = DELTA + O_KEY""")
    assert(spark.sql("SELECT v FROM dml.db.amb").collect().head.getDouble(0) == 10.0)
  }

  test("MERGE ambiguity check sees ADOPTED schema-less tables' legacy partition columns") {
    root
    val s = spark
    import s.implicits._
    // pre-tracking table: a carried manifest with hive partition
    // values, NO tracked snapshot schema, NO declaration — the
    // manifest walk is the only source of the target's column set,
    // so skipping it would let `SET p = p` silently self-assign
    val path = Catalog.createTable(root, "db", "leg")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$path/metadata/manifest-legacy.json"),
      """{"entries": [{"data_file": {"file_path": "data/p=a/f1.parquet",
        | "file_format": "PARQUET", "partition": {"p": "a"},
        | "record_count": 1, "sequence_number": 1}}]}""".stripMargin)
    IcebergLite.commitSnapshot(path, None, entries = Nil,
      carriedManifests = Seq("metadata/manifest-legacy.json"))
    assert(IcebergLite.tableSchema(path).isEmpty, "fixture must stay pre-tracking")
    Seq(("a", 1L)).toDF("p", "k").createOrReplaceTempView("leg_src")
    val amb = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.leg AS t USING leg_src AS src
      ON t.p = src.p
      WHEN MATCHED THEN UPDATE SET p = p"""))
    assert(amb.getMessage.contains("ambiguous"), amb.getMessage)
    // a DECLARATION on the same adopted root must not mask the legacy
    // partition column: the declared fields are unioned with the
    // manifest-walk shape, never substituted for it
    graft.plans.GraftSqlCatalog.declareSchema(path,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("k",
          org.apache.spark.sql.types.LongType))))
    val amb2 = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.leg AS t USING leg_src AS src
      ON t.p = src.p
      WHEN MATCHED THEN UPDATE SET p = p"""))
    assert(amb2.getMessage.contains("ambiguous"), amb2.getMessage)
  }

  test("MERGE ON resolves a case-variant source-key spelling; duplicate keys refuse case-insensitively") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.ckey (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.ckey VALUES (1, 1.0)")
    Seq((1L, 3.0)).toDF("o_key", "w").createOrReplaceTempView("ckey_src")
    // the ON clause spells the source key O_KEY; the source has o_key —
    // Spark's resolver is case-insensitive, so the rename routes too
    spark.sql("""
      MERGE INTO dml.db.ckey AS t USING ckey_src AS src
      ON t.id = src.O_KEY
      WHEN MATCHED THEN UPDATE SET t.v = src.w""")
    assert(spark.sql("SELECT v FROM dml.db.ckey").collect().head.getDouble(0) == 3.0)
    // a case-variant spelling of the TARGET key must not dodge the
    // cast alignment: the renamed key takes the ON spelling ('ID'),
    // and alignment must still find it against schema field 'id',
    // cast the STRING source key to the target's BIGINT, and emit the
    // schema's own casing
    Seq(("1", 8.5)).toDF("o_key", "w").createOrReplaceTempView("ckey_src2")
    spark.sql("""
      MERGE INTO dml.db.ckey AS t USING ckey_src2 AS src
      ON t.ID = src.o_key
      WHEN MATCHED THEN UPDATE SET t.v = src.w""")
    val r = spark.sql("SELECT id, v FROM dml.db.ckey").collect().head
    assert(r.getLong(0) == 1L && r.getDouble(1) == 8.5)
    // two case-variant spellings of ONE source column for two target
    // keys is the same column twice — refuse, don't last-wins the map
    spark.sql("CREATE TABLE dml.db.ckey2 (a BIGINT, b BIGINT, v DOUBLE)")
    Seq((1L, 2.0)).toDF("k", "v").createOrReplaceTempView("ckey2_src")
    val dup = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.ckey2 AS t USING ckey2_src AS src
      ON t.a = src.k AND t.b = src.K
      WHEN MATCHED THEN UPDATE SET t.v = src.v"""))
    assert(dup.getMessage.contains("same source column"), dup.getMessage)
  }

  test("MERGE ambiguity check sees the BRANCH head's evolved schema") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.bramb (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.bramb VALUES (1, 1.0)")
    val path = Catalog.tablePath(root, "db", "bramb")
    IcebergLite.createBranch(path, "dev")
    // branch-only schema evolution: column `w` exists on dev, not main
    IcebergLite.append(spark, path,
      Seq((2L, 2.0, 9.0)).toDF("id", "v", "w"), toBranch = Some("dev"))
    Seq((1L, 7.0)).toDF("id", "w").createOrReplaceTempView("bramb_src")
    // an unqualified `w` is on both the BRANCH target and the source;
    // a main-shape check would miss it and silently self-assign
    val amb = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.bramb.branch_dev AS t USING bramb_src AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET w = w"""))
    assert(amb.getMessage.contains("ambiguous"), amb.getMessage)
    // the same statement against MAIN (no `w` there) refuses too —
    // but for the right reason: `w` is not a main column at all
    intercept[Exception](spark.sql("""
      MERGE INTO dml.db.bramb AS t USING bramb_src AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET w = w"""))
    // qualified, the branch MERGE lands on the branch head
    spark.sql("""
      MERGE INTO dml.db.bramb.branch_dev AS t USING bramb_src AS src
      ON t.id = src.id
      WHEN MATCHED THEN UPDATE SET t.w = src.w""")
    assert(spark.sql(
      "SELECT w FROM dml.db.bramb.branch_dev WHERE id = 1")
      .collect().head.getDouble(0) == 7.0)
    // main never saw branch work
    assert(!spark.sql("SELECT * FROM dml.db.bramb").columns.contains("w"))
  }

  test("case-variant identifier spellings resolve like Spark across INSERT/IN-DML/RENAME") {
    root
    spark.sql("CREATE TABLE dml.db.civ (id BIGINT, v DOUBLE, tag STRING)")
    // column-list INSERT: spellings resolve and normalize; unlisted null-fill
    spark.sql("INSERT INTO dml.db.civ (ID, V) VALUES (1, 1.5), (2, 2.5)")
    val r0 = spark.sql("SELECT id, v, tag FROM dml.db.civ ORDER BY id").collect()
    assert(r0.map(_.getLong(0)).toSeq == Seq(1L, 2L) && r0.forall(_.isNullAt(2)))
    // case-variant duplicate in the list is the same column twice
    val dup = intercept[Exception](
      spark.sql("INSERT INTO dml.db.civ (id, ID) VALUES (3, 4)"))
    assert(dup.getMessage.contains("twice"), dup.getMessage)
    // UPDATE ... IN with a case-variant key spelling
    spark.sql("UPDATE dml.db.civ SET v = v + 10 WHERE ID IN (SELECT 1)")
    assert(spark.sql("SELECT v FROM dml.db.civ WHERE id = 1")
      .collect().head.getDouble(0) == 11.5)
    // DELETE ... IN with a case-variant key spelling (eq-delete route)
    spark.sql("DELETE FROM dml.db.civ WHERE ID IN (SELECT 2)")
    assert(spark.sql("SELECT count(*) FROM dml.db.civ").collect().head.getLong(0) == 1)
    // RENAME COLUMN with a case-variant FROM spelling — works even for
    // an all-NULL column (no file bounds: the tracked schema is the
    // witness of its existence)
    spark.sql("ALTER TABLE dml.db.civ RENAME COLUMN TAG TO label")
    assert(spark.sql("SELECT label FROM dml.db.civ").collect().head.isNullAt(0))
    // ...and an all-NULL column's name is OCCUPIED: renaming another
    // column onto it refuses (previously the bounds-derived column set
    // missed stats-less columns and allowed the collision)
    val occupied = intercept[Exception](
      spark.sql("ALTER TABLE dml.db.civ RENAME COLUMN v TO label"))
    assert(occupied.getMessage.contains("already in use"), occupied.getMessage)
    // declared-only table (no snapshot yet): same resolution, and a
    // TO colliding only by case refuses
    spark.sql("CREATE TABLE dml.db.civ2 (a BIGINT, b DOUBLE)")
    spark.sql("ALTER TABLE dml.db.civ2 RENAME COLUMN A TO c")
    val clash = intercept[Exception](
      spark.sql("ALTER TABLE dml.db.civ2 RENAME COLUMN b TO C"))
    assert(clash.getMessage.contains("already exists"), clash.getMessage)
  }

  test("case-variant resolution survives renamed columns, case-twin collisions, and riders") {
    root
    val s = spark
    import s.implicits._
    // MERGE keyed by a case-variant spelling of a RENAMED target key:
    // the merge primitive's logical->physical translation is exact-
    // case, so the spelling must canonicalize before reaching it
    spark.sql("CREATE TABLE dml.db.cr (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.cr VALUES (1, 1.0)")
    spark.sql("ALTER TABLE dml.db.cr RENAME COLUMN id TO key_id")
    Seq((1L, 4.0)).toDF("key_id", "v").createOrReplaceTempView("cr_src")
    spark.sql("""
      MERGE INTO dml.db.cr AS t USING cr_src AS src
      ON t.KEY_ID = src.key_id
      WHEN MATCHED THEN UPDATE SET t.V = src.v""")
    assert(spark.sql("SELECT v FROM dml.db.cr").collect().head.getDouble(0) == 4.0)
    // snapshot-path RENAME onto a case-twin of a live column refuses
    // (the declared-schema path already did; the table layer's
    // collision check is now case-insensitive too)
    spark.sql("CREATE TABLE dml.db.cr2 (id BIGINT, v DOUBLE, label STRING)")
    spark.sql("INSERT INTO dml.db.cr2 VALUES (1, 1.0, 'x')")
    val twin = intercept[Exception](
      spark.sql("ALTER TABLE dml.db.cr2 RENAME COLUMN v TO LABEL"))
    assert(twin.getMessage.contains("already in use"), twin.getMessage)
    // ...but pure re-casing of the SAME column is legal
    spark.sql("ALTER TABLE dml.db.cr2 RENAME COLUMN label TO LaBeL")
    assert(spark.sql("SELECT * FROM dml.db.cr2").columns.contains("LaBeL"))
    // IN-DML: two case-variant spellings of one key column refuse
    // instead of resolving to a duplicate-column key frame
    val dupDel = intercept[Exception](spark.sql(
      "DELETE FROM dml.db.cr2 WHERE (v, V) IN (SELECT 1.0, 2.0)"))
    assert(dupDel.getMessage.contains("twice"), dupDel.getMessage)
    // NOTE on case-twin source riders (a source column differing only
    // in case from a consumed target column): Spark's own analyzer
    // refuses any reference to them as AMBIGUOUS_REFERENCE before our
    // code runs, so the scenario is unreachable through SQL — the
    // alignment still preserves unconsumed columns by the consumed-set
    // rather than by name, which keeps them intact for the library API.
  }

  test("a flag-tombstone arm without an UPDATE arm refuses with the routing hint") {
    root
    val s = spark
    import s.implicits._
    spark.sql("CREATE TABLE dml.db.tmb (id BIGINT, v DOUBLE)")
    spark.sql("INSERT INTO dml.db.tmb VALUES (1, 1.0)")
    Seq((1L, 2.0, true)).toDF("id", "v", "dead")
      .createOrReplaceTempView("tmb_src")
    val tmb = intercept[Exception](spark.sql("""
      MERGE INTO dml.db.tmb AS t USING tmb_src AS src
      ON t.id = src.id
      WHEN MATCHED AND src.dead THEN DELETE"""))
    assert(tmb.getMessage.contains("flag-tombstone"), tmb.getMessage)
    assert(tmb.getMessage.contains("pre-filter"), tmb.getMessage)
    // the two supported routings both work: CDC replace form...
    spark.sql("""
      MERGE INTO dml.db.tmb AS t USING tmb_src AS src
      ON t.id = src.id
      WHEN MATCHED AND src.dead THEN DELETE
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(spark.sql("SELECT count(*) AS c FROM dml.db.tmb")
      .collect().head.getLong(0) == 0L)
    // ...and delete-only with a pre-filtered source
    spark.sql("INSERT INTO dml.db.tmb VALUES (5, 5.0)")
    spark.sql("""
      MERGE INTO dml.db.tmb AS t
      USING (SELECT id FROM tmb_src WHERE dead) AS src
      ON t.id = src.id
      WHEN MATCHED THEN DELETE""")
    assert(spark.sql("SELECT id FROM dml.db.tmb").collect()
      .map(_.getLong(0)).toSeq == Seq(5L))
  }

  test("UPDATE SET targets resolve case-insensitively on both routes (r13 advice)") {
    root
    spark.sql("CREATE TABLE dml.db.ucase (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.ucase VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    // plain-WHERE route (updateWhere): SET V on column v
    spark.sql("UPDATE dml.db.ucase SET V = 'A' WHERE id = 1")
    // IN-subquery route (update-only merge): SET V keyed by case-variant ID
    spark.sql("""UPDATE dml.db.ucase SET V = upper(v)
                 WHERE ID IN (SELECT 2 AS k)""")
    assert(rows("SELECT id, v, v FROM dml.db.ucase ORDER BY id")
      .map(t => (t._1, t._2)) == Seq((1L, "A"), (2L, "B"), (3L, "c")))
    // the live schema keeps its original casing — resolution, not rename
    assert(spark.sql("SELECT * FROM dml.db.ucase").columns.toSeq ==
      Seq("id", "v"))
    // a genuinely unknown SET target still fails loudly on both routes
    val bad = intercept[Exception](
      spark.sql("UPDATE dml.db.ucase SET nope = 'x' WHERE id = 1"))
    assert(bad.getMessage.toLowerCase.contains("nope"), bad.getMessage)
  }

  test("UPDATE SET resolves case-variant targets of a RENAMED column") {
    root
    spark.sql("CREATE TABLE dml.db.uren (id BIGINT, v STRING)")
    spark.sql("INSERT INTO dml.db.uren VALUES (1, 'a'), (2, 'b')")
    spark.sql("ALTER TABLE dml.db.uren RENAME COLUMN v TO label")
    // the rename map is exact-case in the table layer; a case-variant
    // spelling of the LOGICAL name must canonicalize before it
    spark.sql("UPDATE dml.db.uren SET LABEL = 'z' WHERE id = 2")
    assert(spark.sql("SELECT id, label FROM dml.db.uren ORDER BY id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "z")))
  }
}
