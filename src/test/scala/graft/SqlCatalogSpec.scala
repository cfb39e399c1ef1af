package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.GraftCatalogPlugin
import graft.sources.{Catalog, IcebergLite, IcebergTransforms}

/** SQL surface over the file-backed catalog (SqlCatalog.scala): name
  * resolution, DDL, INSERT, time travel, and — the scale piece —
  * WHERE-driven metadata pruning visible as a smaller file set in the
  * optimized plan. */
class SqlCatalogSpec extends AnyFunSuite {
  import TestSpark._

  // one registered catalog for the whole suite; each test gets its own
  // database so cases stay independent
  private lazy val root: String = {
    val r = Files.createTempDirectory("graft_sqlcat").toString
    spark.conf.set("spark.sql.catalog.sqlcat", classOf[GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.sqlcat.root", r)
    r
  }

  /** Parquet files feeding the scans of the OPTIMIZED plan — where
    * [[graft.plans.GraftMetadataPrune]] has already re-planned the
    * file list (Dataset.inputFiles reads the analyzed plan, which
    * still carries the unpruned marker child). */
  private def scanFiles(df: DataFrame): Seq[String] =
    df.queryExecution.optimizedPlan.collect {
      case l: LogicalRelation => l.relation match {
        case h: HadoopFsRelation => h.location.inputFiles.toSeq
        case _ => Nil
      }
    }.flatten

  test("DDL + INSERT + SELECT round-trip through pure SQL") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.ddl")
    assert(spark.sql("SHOW NAMESPACES IN sqlcat").collect().map(_.getString(0))
      .contains("ddl"))
    spark.sql("CREATE TABLE sqlcat.ddl.kv (k BIGINT, v STRING)")
    assert(spark.sql("SHOW TABLES IN sqlcat.ddl").collect().map(_.getString(1))
      .toSeq == Seq("kv"))
    spark.sql("INSERT INTO sqlcat.ddl.kv VALUES (1, 'a'), (2, 'b')")
    // second insert aligns positionally and CASTS to the schema the
    // first insert established (int literal -> bigint column)
    spark.sql("INSERT INTO sqlcat.ddl.kv SELECT 3, 'c'")
    assert(spark.sql("SELECT k, v FROM sqlcat.ddl.kv ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // DROP deregisters; the standard not-found error follows
    spark.sql("DROP TABLE sqlcat.ddl.kv")
    val err = intercept[Exception](spark.sql("SELECT * FROM sqlcat.ddl.kv"))
    assert(err.getMessage.contains("TABLE_OR_VIEW_NOT_FOUND") ||
      err.getMessage.contains("cannot be found"))
    spark.sql("DROP NAMESPACE sqlcat.ddl")
  }

  test("WHERE prunes the scanned file set through partition metadata") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.prune")
    val path = Catalog.createTable(root, "prune", "events")
    // identity-partitioned by day: 4 days, 1+ file each
    val s = spark
    import s.implicits._
    (0 until 4).foreach { d =>
      IcebergLite.append(spark, path,
        Seq.tabulate(50)(i => (d * 100 + i, s"2024-01-0${d + 1}"))
          .toDF("id", "day"),
        partitionColumns = Seq("day"))
    }
    val all = spark.sql("SELECT * FROM sqlcat.prune.events")
    val one = spark.sql(
      "SELECT id FROM sqlcat.prune.events WHERE day = '2024-01-02'")
    assert(scanFiles(all).size > scanFiles(one).size)
    assert(scanFiles(one).nonEmpty)
    assert(one.count() == 50)
    assert(one.collect().map(_.getInt(0)).min == 100)
    // untranslatable predicate (OR) keeps every file but stays correct
    val or = spark.sql(
      "SELECT count(*) AS n FROM sqlcat.prune.events " +
        "WHERE day = '2024-01-02' OR day = '2024-01-03'")
    assert(or.collect().head.getLong(0) == 100)
    // fully-pruned filter: metadata-only empty result, zero files
    val none = spark.sql(
      "SELECT id, day FROM sqlcat.prune.events WHERE day = '1999-01-01'")
    assert(scanFiles(none).isEmpty)
    assert(none.collect().isEmpty)
    assert(none.columns.toSeq == Seq("id", "day"))
  }

  test("VERSION AS OF: snapshot id, tag, branch; TIMESTAMP AS OF") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.tt")
    val path = Catalog.createTable(root, "tt", "t")
    val s = spark
    import s.implicits._
    val snap1 = IcebergLite.append(spark, path, Seq((1, "one")).toDF("id", "v"))
    val ts1 = IcebergLite.snapshotTimestampMs(path, snap1)
    IcebergLite.createTag(path, "v1", Some(snap1))
    IcebergLite.createBranch(path, "audit", Some(snap1))
    val snap2 = IcebergLite.append(spark, path, Seq((2, "two")).toDF("id", "v"))
    assert(spark.sql(s"SELECT count(*) AS n FROM sqlcat.tt.t")
      .collect().head.getLong(0) == 2)
    assert(spark.sql(s"SELECT count(*) AS n FROM sqlcat.tt.t VERSION AS OF $snap1")
      .collect().head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.tt.t VERSION AS OF 'v1'")
      .collect().head.getLong(0) == 1)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.tt.t VERSION AS OF 'audit'")
      .collect().head.getLong(0) == 1)
    val tsLit = java.time.Instant.ofEpochMilli(ts1).toString.replace("Z", "")
    assert(spark.sql(
      s"SELECT count(*) AS n FROM sqlcat.tt.t TIMESTAMP AS OF '${tsLit}Z'")
      .collect().head.getLong(0) == 1)
    assert(snap2 > snap1)
  }

  test("INSERT OVERWRITE replaces exactly the partitions the query emits") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.ow")
    // PARTITIONED BY maps onto the hidden-partitioning spec
    spark.sql(
      "CREATE TABLE sqlcat.ow.days (day STRING, n INT) PARTITIONED BY (day)")
    assert(IcebergLite.partitionSpec(Catalog.tablePath(root, "ow", "days"))
      .map(_.name) == Seq("day"))
    spark.sql("INSERT INTO sqlcat.ow.days VALUES ('d1', 10), ('d2', 20)")
    // re-run d2's load: d2 replaced, d1 carried verbatim
    spark.sql("INSERT OVERWRITE sqlcat.ow.days VALUES ('d2', 99)")
    assert(spark.sql("SELECT day, n FROM sqlcat.ow.days ORDER BY day").collect()
      .map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("d1", 10), ("d2", 99)))
    // unpartitioned tables refuse INSERT OVERWRITE with a clear message
    Catalog.createTable(root, "ow", "flat")
    spark.sql("INSERT INTO sqlcat.ow.flat VALUES (1)")
    val err = intercept[Exception](
      spark.sql("INSERT OVERWRITE sqlcat.ow.flat VALUES (2)"))
    assert(err.getMessage.contains("partition spec"))
  }

  test("joins and subqueries compose across catalog tables") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.j")
    val s = spark
    import s.implicits._
    IcebergLite.append(spark, Catalog.createTable(root, "j", "dim"),
      Seq((1, "x"), (2, "y")).toDF("id", "name"))
    IcebergLite.append(spark, Catalog.createTable(root, "j", "fact"),
      Seq((1, 10.0), (1, 5.0), (2, 7.0)).toDF("id", "amt"))
    val joined = spark.sql("""
      SELECT d.name, sum(f.amt) AS total
      FROM sqlcat.j.fact f JOIN sqlcat.j.dim d ON f.id = d.id
      WHERE f.id IN (SELECT id FROM sqlcat.j.dim WHERE name <> 'zzz')
      GROUP BY d.name ORDER BY d.name""").collect()
    assert(joined.map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("x", 15.0), ("y", 7.0)))
  }

  test("DESCRIBE TABLE answers from metadata; CTAS registers, declares, and loads") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.meta")
    spark.sql("""CREATE TABLE sqlcat.meta.src (id BIGINT, grp STRING, n INT)
                 PARTITIONED BY (grp)""")
    spark.sql("INSERT INTO sqlcat.meta.src VALUES (1, 'g1', 5), (2, 'g2', 6)")
    val desc = spark.sql("DESCRIBE TABLE sqlcat.meta.src").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    assert(desc.contains(("id", "bigint")) && desc.contains(("n", "int")))
    assert(desc.exists(_._1 == "# Partition Information"))
    // CTAS: one statement registers + declares schema + appends
    spark.sql("""CREATE TABLE sqlcat.meta.agg AS
                 SELECT grp, sum(n) AS total FROM sqlcat.meta.src GROUP BY grp""")
    assert(spark.sql("SELECT grp, total FROM sqlcat.meta.agg ORDER BY grp")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("g1", 5L), ("g2", 6L)))
    // CTAS with PARTITIONED BY lays out through the hidden spec
    spark.sql("""CREATE TABLE sqlcat.meta.bygrp PARTITIONED BY (grp) AS
                 SELECT id, grp FROM sqlcat.meta.src""")
    assert(IcebergLite.partitionSpec(
      Catalog.tablePath(root, "meta", "bygrp")).map(_.name) == Seq("grp"))
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.meta.bygrp")
      .collect().head.getLong(0) == 2)
    val dup = intercept[Exception](
      spark.sql("CREATE TABLE sqlcat.meta.agg AS SELECT 1 AS x"))
    assert(dup.getMessage.toLowerCase.contains("exists"))
  }

  test("ALTER TABLE column evolution: add null-fills, rename is snapshot-scoped, widen promotes") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.evo")
    spark.sql("CREATE TABLE sqlcat.evo.t (id INT, v STRING)")
    // evolution before any data rewrites the declaration
    spark.sql("ALTER TABLE sqlcat.evo.t ADD COLUMNS (w STRING)")
    spark.sql("INSERT INTO sqlcat.evo.t VALUES (1, 'a', 'w1')")
    // metadata-only evolution on a live table
    spark.sql("ALTER TABLE sqlcat.evo.t ADD COLUMNS (n BIGINT)")
    spark.sql("ALTER TABLE sqlcat.evo.t ALTER COLUMN id TYPE BIGINT")
    spark.sql("ALTER TABLE sqlcat.evo.t RENAME COLUMN v TO label")
    spark.sql("INSERT INTO sqlcat.evo.t VALUES (2147483648, 'b', 'w2', 9)")
    val got = spark.sql(
      "SELECT id, label, w, n FROM sqlcat.evo.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        if (r.isNullAt(3)) -1L else r.getLong(3))).toSeq
    assert(got == Seq((1L, "a", "w1", -1L), (2147483648L, "b", "w2", 9L)))
    val narrow = intercept[Exception](
      spark.sql("ALTER TABLE sqlcat.evo.t ALTER COLUMN n TYPE INT"))
    assert(narrow.getMessage.contains("widening"))
  }

  test("nested-field SQL evolution: ADD COLUMNS s.x and ALTER COLUMN s.x TYPE") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.nse")
    spark.sql("CREATE TABLE sqlcat.nse.t (id BIGINT, s STRUCT<a: STRING>)")
    spark.sql("INSERT INTO sqlcat.nse.t VALUES (1, named_struct('a', 'one'))")
    val path = Catalog.tablePath(root, "nse", "t")
    val snapsBefore = IcebergLite.snapshots(path).size
    // one statement (mixed top-level + nested) = ONE metadata commit
    spark.sql("ALTER TABLE sqlcat.nse.t ADD COLUMNS (top STRING, s.x INT)")
    assert(IcebergLite.snapshots(path).size == snapsBefore + 1)
    spark.sql("INSERT INTO sqlcat.nse.t VALUES " +
      "(2, named_struct('a', 'two', 'x', 7), 't2')")
    // nested widen, then a value only BIGINT can hold
    spark.sql("ALTER TABLE sqlcat.nse.t ALTER COLUMN s.x TYPE BIGINT")
    spark.sql("INSERT INTO sqlcat.nse.t VALUES " +
      "(3, named_struct('a', 'three', 'x', 4000000000), 't3')")
    val got = spark.sql(
      "SELECT id, s.a AS sa, s.x AS sx FROM sqlcat.nse.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSeq
    assert(got == Seq((1L, "one", -1L), (2L, "two", 7L),
      (3L, "three", 4000000000L)))
    // refusals keep their shapes: duplicate nested field, non-struct
    // path, nested narrow
    val dup = intercept[Exception](
      spark.sql("ALTER TABLE sqlcat.nse.t ADD COLUMNS (s.x INT)"))
    assert(dup.getMessage.contains("already exists"))
    val notStruct = intercept[Exception](
      spark.sql("ALTER TABLE sqlcat.nse.t ADD COLUMNS (id.y INT)"))
    assert(notStruct.getMessage.contains("not a struct"))
    val narrow2 = intercept[Exception](
      spark.sql("ALTER TABLE sqlcat.nse.t ALTER COLUMN s.x TYPE INT"))
    assert(narrow2.getMessage.contains("widening"))
    // declared-table (pre-data) nested evolution rewrites the declaration
    spark.sql("CREATE TABLE sqlcat.nse.d (id BIGINT, s STRUCT<a: STRING>)")
    spark.sql("ALTER TABLE sqlcat.nse.d ADD COLUMNS (s.x INT)")
    spark.sql("INSERT INTO sqlcat.nse.d VALUES (1, named_struct('a', 'z', 'x', 5))")
    assert(spark.sql("SELECT s.x AS sx FROM sqlcat.nse.d").collect()
      .head.getInt(0) == 5)
  }

  test("metadata tables resolve as 4-part names; SHOW PARTITIONS lists tuples") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.meta4")
    spark.sql("""CREATE TABLE sqlcat.meta4.t (id BIGINT, p STRING)
                 PARTITIONED BY (p)""")
    spark.sql("INSERT INTO sqlcat.meta4.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO sqlcat.meta4.t VALUES (3, 'b')")
    val hist = spark.sql(
      "SELECT operation, n_files FROM sqlcat.meta4.t.history ORDER BY snapshot_id")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(hist.map(_._1) == Seq("append", "append") && hist.last._2 >= 2)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.meta4.t.files")
      .collect().head.getLong(0) >= 2)
    assert(spark.sql("SELECT * FROM sqlcat.meta4.t.partitions").count() == 2)
    assert(spark.sql("SHOW PARTITIONS sqlcat.meta4.t").collect()
      .map(_.getString(0)).toSeq == Seq("p=a", "p=b"))
    // joins against metadata tables compose like any relation
    val joined = spark.sql("""
      SELECT count(*) AS n FROM sqlcat.meta4.t.files f
      JOIN sqlcat.meta4.t.files g ON f.file_path = g.file_path""")
    assert(joined.collect().head.getLong(0) >= 2)
    // branch_/tag_ suffixes read the ref head (Iceberg's naming)
    val path = Catalog.tablePath(root, "meta4", "t")
    IcebergLite.createBranch(path, "audit")
    spark.sql("INSERT INTO sqlcat.meta4.t VALUES (4, 'c')")
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.meta4.t.branch_audit")
      .collect().head.getLong(0) == 3)
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.meta4.t")
      .collect().head.getLong(0) == 4)
  }

  test("TBLPROPERTIES: typed write knobs take effect, annotations round-trip") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.props")
    spark.sql("CREATE TABLE sqlcat.props.t (id BIGINT, p STRING)")
    spark.sql("""ALTER TABLE sqlcat.props.t SET TBLPROPERTIES (
      'write.max-records-per-file' = '10', 'pipeline.team' = 'data-eng')""")
    val path = Catalog.tablePath(root, "props", "t")
    assert(IcebergLite.maxRecordsPerFile(path) == 10L)
    val shown = spark.sql("SHOW TBLPROPERTIES sqlcat.props.t").collect()
      .map(r => (r.getString(0), r.getString(1))).toMap
    assert(shown == Map(
      "write.max-records-per-file" -> "10", "pipeline.team" -> "data-eng"))
    // the row bound is LIVE: a 25-row insert must cut >= 3 files
    val s = spark
    import s.implicits._
    spark.sql("INSERT INTO sqlcat.props.t SELECT id, 'x' FROM range(25)")
    assert(IcebergLite.dataFiles(path).size >= 3)
    spark.sql("ALTER TABLE sqlcat.props.t UNSET TBLPROPERTIES " +
      "('write.max-records-per-file', 'pipeline.team')")
    assert(IcebergLite.maxRecordsPerFile(path) == 0L)
    assert(spark.sql("SHOW TBLPROPERTIES sqlcat.props.t").collect().isEmpty)
  }

  test("CALL graft.system.* runs the maintenance surface with row results") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.proc")
    spark.sql("CREATE TABLE sqlcat.proc.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO sqlcat.proc.t VALUES (1, 'a')")
    spark.sql("INSERT INTO sqlcat.proc.t VALUES (2, 'b')")
    spark.sql("INSERT INTO sqlcat.proc.t VALUES (3, 'c')")
    val path = Catalog.tablePath(root, "proc", "t")
    val snaps = IcebergLite.snapshots(path)

    // rollback + cherry-pick: history surgery via CALL
    val rb = spark.sql(
      s"CALL sqlcat.system.rollback_to_snapshot('proc.t', ${snaps(1)})").collect()
    assert(rb.head.getLong(0) == snaps(1))
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.proc.t")
      .collect().head.getLong(0) == 2)
    spark.sql(s"CALL sqlcat.system.cherrypick_snapshot('proc.t', ${snaps(2)})")
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.proc.t")
      .collect().head.getLong(0) == 3)

    // compaction returns the new snapshot id; table is 1 file after
    val rw = spark.sql(
      "CALL sqlcat.system.rewrite_data_files('proc.t', 0)").collect()
    assert(rw.head.getLong(0) == IcebergLite.currentSnapshotId(path).get)
    assert(IcebergLite.dataFiles(path).size == 1)

    // branch + tag + expiry with row counts
    spark.sql("CALL sqlcat.system.create_tag('proc.t', 'rel')")
    val exp = spark.sql(
      "CALL sqlcat.system.expire_snapshots('proc.t', 1, 0)").collect()
    assert(exp.head.getInt(0) >= 1)
    // the tag pins the current snapshot; reads still work
    assert(spark.sql("SELECT count(*) AS n FROM sqlcat.proc.t VERSION AS OF 'rel'")
      .collect().head.getLong(0) == 3)
    val orph = spark.sql(
      "CALL sqlcat.system.remove_orphan_files('proc.t', 0)").collect()
    assert(orph.head.getInt(0) >= 0)
  }

  test("analysis is lazy: a vanished file outside the pruned set never blocks the query") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.lazy")
    spark.sql("""CREATE TABLE sqlcat.lazy.t (id BIGINT, p STRING)
                 PARTITIONED BY (p)""")
    spark.sql("INSERT INTO sqlcat.lazy.t VALUES (1, 'a'), (2, 'b')")
    val path = Catalog.tablePath(root, "lazy", "t")
    // simulate a storage hole in partition b (the manifest still
    // lists the file)
    val bFile = IcebergLite.dataFiles(path)
      .find(_.partition.get("p").contains("b")).get.filePath
    Files.delete(java.nio.file.Paths.get(s"$path/$bFile"))
    // ANALYSIS lists nothing — even the unfiltered plan resolves
    val all = spark.sql("SELECT id FROM sqlcat.lazy.t")
    assert(all.schema.fieldNames.toSeq == Seq("id"))
    // a query pruned to partition a never touches b's missing file
    assert(spark.sql("SELECT id FROM sqlcat.lazy.t WHERE p = 'a'")
      .collect().map(_.getLong(0)).toSeq == Seq(1L))
    // the unfiltered EXECUTION is what must fail
    intercept[Exception](all.collect())
  }

  test("writes align from metadata: INSERT and MERGE succeed with a vanished file elsewhere") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.lazyw")
    spark.sql("""CREATE TABLE sqlcat.lazyw.t (id BIGINT, p STRING)
                 PARTITIONED BY (p)""")
    spark.sql("INSERT INTO sqlcat.lazyw.t VALUES (1, 'a'), (2, 'b')")
    val path = Catalog.tablePath(root, "lazyw", "t")
    // storage hole in partition b — schema alignment must never plan
    // the read (O(files) + existence checks), so writes that don't
    // touch b keep working
    val bFile = IcebergLite.dataFiles(path)
      .find(_.partition.get("p").contains("b")).get.filePath
    Files.delete(java.nio.file.Paths.get(s"$path/$bFile"))
    spark.sql("INSERT INTO sqlcat.lazyw.t VALUES (3, 'a')")
    // expr-MERGE scoped to partition-a keys: touched files exclude b
    spark.sql("""
      MERGE INTO sqlcat.lazyw.t AS t
      USING (SELECT 1 AS k, 'A' AS np UNION ALL SELECT 3, 'AA') AS s
      ON t.id = s.k
      WHEN MATCHED THEN UPDATE SET t.p = s.np""")
    // read back through exact-prunable predicates (the vanished b
    // partition must stay out of the plan)
    assert(spark.sql("SELECT id, p FROM sqlcat.lazyw.t WHERE p = 'A'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "A")))
    assert(spark.sql("SELECT id, p FROM sqlcat.lazyw.t WHERE p = 'AA'")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((3L, "AA")))
  }

  test("SHOW CREATE TABLE renders a re-runnable declaration from metadata") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.sct")
    spark.sql("""CREATE TABLE sqlcat.sct.t (id BIGINT, day STRING, n INT)
                 PARTITIONED BY (day, bucket(4, id))""")
    spark.sql("ALTER TABLE sqlcat.sct.t SET TBLPROPERTIES " +
      "('write.max-records-per-file' = '100')")
    spark.sql("INSERT INTO sqlcat.sct.t VALUES (1, 'd1', 5)")
    val ddl = spark.sql("SHOW CREATE TABLE sqlcat.sct.t")
      .collect().head.getString(0)
    assert(ddl.contains("CREATE TABLE sqlcat.sct.t"))
    assert(ddl.contains("id BIGINT") && ddl.contains("n INT"))
    assert(ddl.contains("PARTITIONED BY (day, bucket(4, id))"))
    assert(ddl.contains("'write.max-records-per-file' = '100'"))
  }

  test("SHOW CREATE TABLE re-runs for temporally-partitioned tables") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.sct2")
    spark.sql("""CREATE TABLE sqlcat.sct2.ev (id BIGINT, ts TIMESTAMP)
                 PARTITIONED BY (days(ts))""")
    val ddl = spark.sql("SHOW CREATE TABLE sqlcat.sct2.ev")
      .collect().head.getString(0)
    // singular tag ("day") must render as the plural SQL transform the
    // parser + toSpecField accept
    assert(ddl.contains("PARTITIONED BY (days(ts))"), ddl)
    // the declaration IS re-runnable: replay it under a new name
    spark.sql(ddl.replace("sqlcat.sct2.ev", "sqlcat.sct2.ev2"))
    spark.sql("INSERT INTO sqlcat.sct2.ev2 VALUES " +
      "(1, TIMESTAMP '2024-03-01 10:00:00')")
    assert(spark.sql("SELECT id FROM sqlcat.sct2.ev2").collect()
      .map(_.getLong(0)).toSeq == Seq(1L))
    val path2 = Catalog.tablePath(root, "sct2", "ev2")
    assert(IcebergLite.partitionSpec(path2)
      .map(f => (f.source, f.transform)) ==
      Seq(("ts", IcebergTransforms.Day)))
  }

  test("concurrent DML: the commit lock serializes; a lost parent aborts cleanly") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.cc")
    spark.sql("CREATE TABLE sqlcat.cc.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO sqlcat.cc.t VALUES (1, 'a'), (2, 'b')")
    // two UPDATEs racing on different rows: each either commits or
    // aborts with a conflict — never a lost update
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val results = Await.result(Future.sequence((0 until 2).toList.map(i => Future {
      try { spark.sql(s"UPDATE sqlcat.cc.t SET v = 'u$i' WHERE id = ${i + 1}"); None }
      catch { case e: Exception => Some(e) }
    })), 120.seconds)
    val failures = results.flatten
    val rows = spark.sql("SELECT id, v FROM sqlcat.cc.t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    if (failures.isEmpty)
      assert(rows == Seq((1L, "u0"), (2L, "u1")))
    else {
      // exactly one aborted; the winner's update (and only it) landed
      assert(failures.size == 1)
      assert(rows.count(_._2.startsWith("u")) == 1)
      assert(rows.map(_._1) == Seq(1L, 2L))
    }
  }

  test("catalog plugin table listing stays in sync with DDL") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.sync")
    spark.sql("CREATE TABLE sqlcat.sync.a (x INT)")
    spark.sql("CREATE TABLE sqlcat.sync.b (x INT)")
    spark.sql("ALTER TABLE sqlcat.sync.a RENAME TO sqlcat.sync.c")
    assert(Catalog.listTables(root, "sync") == Seq("b", "c"))
    assert(spark.sql("SHOW TABLES IN sqlcat.sync").collect()
      .map(_.getString(1)).sorted.toSeq == Seq("b", "c"))
  }

  test("INSERT with an explicit column list: reorder, null-fill, refusals") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.ins")
    spark.sql("CREATE TABLE sqlcat.ins.t (a BIGINT, b STRING, c DOUBLE)")
    // the list is positional: (b, a) maps 'x'→b, 1→a; unlisted c nulls
    spark.sql("INSERT INTO sqlcat.ins.t (b, a) VALUES ('x', 1), ('y', 2)")
    // full-list reorder round-trips every column
    spark.sql("INSERT INTO sqlcat.ins.t (c, a, b) VALUES (0.5, 3, 'z')")
    assert(spark.sql("SELECT a, b, c FROM sqlcat.ins.t ORDER BY a").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSeq ==
      Seq((1L, "x", None), (2L, "y", None), (3L, "z", Some(0.5))))
    // refusals: unknown name, duplicate name, arity mismatch
    assert(intercept[Exception](spark.sql(
      "INSERT INTO sqlcat.ins.t (a, nope) VALUES (4, 'w')"))
      .getMessage.contains("absent"))
    assert(intercept[Exception](spark.sql(
      "INSERT INTO sqlcat.ins.t (a, a) VALUES (4, 5)"))
      .getMessage.contains("twice"))
    assert(intercept[Exception](spark.sql(
      "INSERT INTO sqlcat.ins.t (a, b) VALUES (4, 'w', 1.0)"))
      .getMessage.contains("column list"))
  }

  test("persisted views: create, read, nest, alias, replace, drop, refusals") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.vw")
    spark.sql("CREATE TABLE sqlcat.vw.t (id BIGINT, region STRING, amt DOUBLE)")
    spark.sql("""INSERT INTO sqlcat.vw.t VALUES
      (1, 'east', 10.0), (2, 'east', 5.0), (3, 'west', 20.0)""")
    // body uses an UNQUALIFIED table name — it must scope to the
    // view's own catalog.database for every reader
    spark.sql("""CREATE VIEW sqlcat.vw.totals AS
      SELECT region, sum(amt) AS total FROM t GROUP BY region""")
    assert(spark.sql("SELECT * FROM sqlcat.vw.totals ORDER BY region").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq ==
      Seq(("east", 15.0), ("west", 20.0)))
    // view over view, with a column-alias list
    spark.sql("""CREATE VIEW sqlcat.vw.big (r, t) AS
      SELECT region, total FROM totals WHERE total > 16""")
    assert(spark.sql("SELECT r, t FROM sqlcat.vw.big").collect()
      .map(r => (r.getString(0), r.getDouble(1))).toSeq == Seq(("west", 20.0)))
    // the view tracks the TABLE, not a snapshot
    spark.sql("INSERT INTO sqlcat.vw.t VALUES (4, 'west', 1.0)")
    assert(spark.sql("SELECT total FROM sqlcat.vw.totals WHERE region='west'")
      .collect().head.getDouble(0) == 21.0)
    // SHOW VIEWS and OR REPLACE
    assert(spark.sql("SHOW VIEWS IN sqlcat.vw").collect()
      .map(_.getString(1)).sorted.toSeq == Seq("big", "totals"))
    spark.sql("""CREATE OR REPLACE VIEW sqlcat.vw.big (r, t) AS
      SELECT region, total FROM totals WHERE total > 0""")
    assert(spark.sql("SELECT count(*) AS c FROM sqlcat.vw.big")
      .collect().head.getLong(0) == 2L)
    // IF NOT EXISTS no-ops on an existing view
    spark.sql("""CREATE VIEW IF NOT EXISTS sqlcat.vw.big AS
      SELECT 1 AS nope""")
    assert(spark.sql("SELECT r FROM sqlcat.vw.big").columns.contains("r"))
    // refusals: name clash with a table, cycle through OR REPLACE,
    // invalid body caught at CREATE time
    assert(intercept[Exception](spark.sql(
      "CREATE VIEW sqlcat.vw.t AS SELECT 1")).getMessage.contains("already exists"))
    assert(intercept[Exception](spark.sql(
      """CREATE OR REPLACE VIEW sqlcat.vw.totals AS
         SELECT r AS region, t AS total FROM big"""))
      .getMessage.contains("cyclic"))
    intercept[Exception](spark.sql(
      "CREATE VIEW sqlcat.vw.bad AS SELECT no_such_col FROM t"))
    // a failed CREATE stores nothing
    assert(intercept[Exception](spark.sql("SELECT * FROM sqlcat.vw.bad"))
      .getMessage.toLowerCase.contains("not"))
    // DROP: the view goes, the table stays; IF EXISTS tolerates a rerun
    spark.sql("DROP VIEW sqlcat.vw.big")
    spark.sql("DROP VIEW IF EXISTS sqlcat.vw.big")
    assert(intercept[Exception](spark.sql("DROP VIEW sqlcat.vw.big"))
      .getMessage.contains("does not exist"))
    assert(spark.sql("SHOW VIEWS IN sqlcat.vw").collect()
      .map(_.getString(1)).toSeq == Seq("totals"))
    assert(spark.sql("SELECT count(*) AS c FROM sqlcat.vw.t")
      .collect().head.getLong(0) == 4L)
    // ALTER VIEW AS: new body, properties survive, aliases reset
    spark.sql("ALTER VIEW sqlcat.vw.totals SET TBLPROPERTIES ('team' = 'data')")
    spark.sql("""ALTER VIEW sqlcat.vw.totals AS
      SELECT region, count(*) AS total FROM t GROUP BY region""")
    assert(spark.sql("SELECT total FROM sqlcat.vw.totals WHERE region='west'")
      .collect().head.getLong(0) == 2L)
    // UNSET with a missing key refuses without IF EXISTS; SET survived
    // the AS-rewrite
    val noKey = intercept[Exception](spark.sql(
      "ALTER VIEW sqlcat.vw.totals UNSET TBLPROPERTIES ('nope')"))
    assert(noKey.getMessage.contains("not set"))
    spark.sql("ALTER VIEW sqlcat.vw.totals UNSET TBLPROPERTIES IF EXISTS ('nope')")
    spark.sql("ALTER VIEW sqlcat.vw.totals UNSET TBLPROPERTIES ('team')")
    // SHOW CREATE TABLE renders the re-runnable view declaration
    val decl = spark.sql("SHOW CREATE TABLE sqlcat.vw.totals")
      .collect().head.getString(0)
    assert(decl.startsWith("CREATE VIEW sqlcat.vw.totals") &&
      decl.contains("count(*)"))
    // restore the original body for the assertions below
    spark.sql("""ALTER VIEW sqlcat.vw.totals AS
      SELECT region, sum(amt) AS total FROM t GROUP BY region""")
    // DESCRIBE serves the stored schema plus the original text
    val desc = spark.sql("DESCRIBE TABLE sqlcat.vw.totals").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(desc.take(2).toSeq ==
      Seq(("region", "string"), ("total", "double")))
    assert(desc.exists { case (k, v) =>
      k == "# View Text" && v.contains("GROUP BY") })
    // cross-process read: bump views.json's mtime so the parse cache
    // misses and the document round-trips through JSON extraction
    // (in-process reads otherwise always hit the write-through cache)
    val vf = java.nio.file.Paths.get(root, "views.json")
    java.nio.file.Files.setLastModifiedTime(vf,
      java.nio.file.attribute.FileTime.fromMillis(
        java.nio.file.Files.getLastModifiedTime(vf).toMillis + 7000))
    assert(spark.sql("SELECT total FROM sqlcat.vw.totals WHERE region='west'")
      .collect().head.getDouble(0) == 21.0)
  }

  test("views scope to the reader's catalog name, respect CTE shadowing, drop with their namespace") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.vx")
    spark.sql("CREATE TABLE sqlcat.vx.t (x BIGINT)")
    spark.sql("INSERT INTO sqlcat.vx.t VALUES (1), (2)")
    spark.sql("CREATE VIEW sqlcat.vx.v AS SELECT x FROM t")
    // the SAME root registered under a second name must serve the view
    // (scoping uses the reader's catalog, not the creation-time name)
    spark.conf.set("spark.sql.catalog.sqlcat2",
      classOf[graft.plans.GraftCatalogPlugin].getName)
    spark.conf.set("spark.sql.catalog.sqlcat2.root", root)
    assert(spark.sql("SELECT sum(x) AS s FROM sqlcat2.vx.v")
      .collect().head.getLong(0) == 3L)
    // a CTE named like the view itself shadows it (SQL scoping) — the
    // cycle check must not refuse this legal OR REPLACE
    spark.sql("""CREATE OR REPLACE VIEW sqlcat.vx.v AS
      WITH v AS (SELECT CAST(10 AS BIGINT) AS x) SELECT x FROM v""")
    assert(spark.sql("SELECT x FROM sqlcat.vx.v").collect()
      .map(_.getLong(0)).toSeq == Seq(10L))
    // a CTE in a nested scope must NOT shadow a same-named real table
    // used elsewhere in the body (lexical, not global, exemption)
    spark.sql("""CREATE VIEW sqlcat.vx.mixed AS
      SELECT a.x + b.q AS x
      FROM t AS a JOIN (WITH t AS (SELECT 100 AS q) SELECT q FROM t) AS b""")
    assert(spark.sql("SELECT sum(x) AS s FROM sqlcat.vx.mixed")
      .collect().head.getLong(0) == 203L)
    // DROP NAMESPACE: views block a non-cascade drop and die with a
    // cascade — no orphaned document may keep resolving afterward
    val notEmpty = intercept[Exception](
      spark.sql("DROP NAMESPACE sqlcat.vx"))
    assert(notEmpty.getMessage.contains("not empty"))
    spark.sql("DROP NAMESPACE sqlcat.vx CASCADE")
    intercept[Exception](spark.sql("SELECT * FROM sqlcat.vx.v"))
    spark.sql("CREATE NAMESPACE sqlcat.vx")
    // the name is free again: no zombie view blocks a same-named table
    spark.sql("CREATE TABLE sqlcat.vx.v (y BIGINT)")
    spark.sql("DROP NAMESPACE sqlcat.vx CASCADE")
  }

  test("unfiltered COUNT(*) answers from manifest-list totals, never a scan") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.cnt")
    spark.sql("CREATE TABLE sqlcat.cnt.t (id BIGINT, v STRING)")
    spark.sql("INSERT INTO sqlcat.cnt.t VALUES (1, 'a'), (2, 'b'), (3, NULL)")
    spark.sql("INSERT INTO sqlcat.cnt.t VALUES (4, 'd')")
    val cnt = spark.sql("SELECT count(*) AS c, count(1) AS c1 FROM sqlcat.cnt.t")
    assert(cnt.collect().head.getLong(0) == 4L && cnt.collect().head.getLong(1) == 4L)
    assert(scanFiles(cnt).isEmpty, "metadata answer must plan no file scan")
    // a MoR delete makes totals disagree with a read: the rewrite
    // must refuse and the scanned count stay correct
    val path = Catalog.tablePath(root, "cnt", "t")
    val s = spark
    import s.implicits._
    IcebergLite.deleteEquality(spark, path, Seq(2L).toDF("id"))
    val afterDel = spark.sql("SELECT count(*) AS c FROM sqlcat.cnt.t")
    assert(afterDel.collect().head.getLong(0) == 3L)
    assert(scanFiles(afterDel).nonEmpty, "pending deletes must force the scan")
    // null-sensitive and filtered counts keep scanning too
    assert(spark.sql("SELECT count(v) AS c FROM sqlcat.cnt.t")
      .collect().head.getLong(0) == 2L)
    assert(spark.sql("SELECT count(*) AS c FROM sqlcat.cnt.t WHERE id > 1")
      .collect().head.getLong(0) == 2L)
    // time travel counts the PINNED snapshot's totals
    val snap1 = IcebergLite.snapshots(path).min
    assert(spark.sql(s"SELECT count(*) AS c FROM sqlcat.cnt.t VERSION AS OF $snap1")
      .collect().head.getLong(0) == 3L)
  }

  test("SHOW VIEWS patterns: metachars are literal, '*' globs, '|' alternates") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.vpat")
    spark.sql("CREATE VIEW sqlcat.vpat.axb AS SELECT 1 AS one")
    spark.sql("CREATE VIEW sqlcat.vpat.ayb AS SELECT 2 AS two")
    def shown(like: String): Seq[String] =
      spark.sql(s"SHOW VIEWS IN sqlcat.vpat LIKE '$like'").collect()
        .map(_.getString(1)).sorted.toSeq
    // '.' is a LITERAL dot, not regex any-char: 'a.b' must match nothing
    assert(shown("a.b") == Nil)
    // regex metachars must not throw PatternSyntaxException
    assert(shown("[") == Nil)
    assert(shown("a(b") == Nil)
    // the two documented metacharacters still work
    assert(shown("a*") == Seq("axb", "ayb"))
    assert(shown("axb|nope") == Seq("axb"))
    assert(shown("*x*") == Seq("axb"))
  }

  test("CREATE VIEW IF NOT EXISTS: no-ops on view AND table names, races cleanly") {
    root
    spark.sql("CREATE NAMESPACE sqlcat.vine")
    spark.sql("CREATE TABLE sqlcat.vine.base (x BIGINT)")
    // Spark parity (CreateViewCommand checks allowExisting FIRST): IF
    // NOT EXISTS over a name a TABLE holds no-ops, it does not throw
    spark.sql("CREATE VIEW IF NOT EXISTS sqlcat.vine.base AS SELECT 1 AS one")
    assert(spark.sql("SHOW VIEWS IN sqlcat.vine").collect().isEmpty)
    // without IF NOT EXISTS the table-namespace refusal stands, and OR
    // REPLACE must not replace a TABLE either
    assert(intercept[Exception](spark.sql(
      "CREATE VIEW sqlcat.vine.base AS SELECT 1")).getMessage
      .contains("already exists"))
    assert(intercept[Exception](spark.sql(
      "CREATE OR REPLACE VIEW sqlcat.vine.base AS SELECT 1")).getMessage
      .contains("already exists"))
    // concurrent CREATE VIEW IF NOT EXISTS: the exists decision lives
    // INSIDE the commit lock, so every racer either creates or no-ops —
    // none may observe the half-state and throw
    val doc = Catalog.ViewDoc("SELECT 1 AS one", "sqlcat", Nil, None,
      Map.empty, new org.apache.spark.sql.types.StructType()
        .add("one", org.apache.spark.sql.types.IntegerType).json)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val results = (1 to 8).map { _ =>
      pool.submit(new java.util.concurrent.Callable[Option[String]] {
        def call(): Option[String] =
          try { Catalog.createView(root, "vine", "racev", doc,
            replace = false, allowExisting = true); None }
          catch { case e: Exception => Some(e.getMessage) }
      })
    }.map(_.get())
    pool.shutdown()
    assert(results.forall(_.isEmpty), s"IF NOT EXISTS racers must not throw: $results")
    assert(spark.sql("SHOW VIEWS IN sqlcat.vine").collect()
      .map(_.getString(1)).toSeq == Seq("racev"))
    assert(spark.sql("SELECT one FROM sqlcat.vine.racev").collect()
      .head.getInt(0) == 1)
  }

  test("resolveColumn prefers an exact-case match over the first case-twin (r13 advice)") {
    import graft.plans.GraftSqlCatalog.resolveColumn
    // legacy tables created before the collision guards can hold
    // case-twin columns; an exactly-spelled identifier must resolve to
    // its own twin regardless of schema order
    assert(resolveColumn(Seq("V", "v"), "v") == Some("v"))
    assert(resolveColumn(Seq("V", "v"), "V") == Some("V"))
    assert(resolveColumn(Seq("v", "V"), "V") == Some("V"))
    // no exact twin → case-insensitive resolution, first match
    assert(resolveColumn(Seq("Value", "other"), "VALUE") == Some("Value"))
    assert(resolveColumn(Seq("a", "b"), "c") == None)
  }
}
