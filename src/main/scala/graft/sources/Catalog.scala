package graft.sources

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._

/** File-backed table CATALOG — the deployment analogue of the
  * reference's metastore client (`/root/reference/src/metastore/
  * mod.rs:16-86`): that client asks an HTTP service for
  * list_databases / list_tables / get_table (schema included), scoped
  * to a branch id. Here the same surface is ONE JSON document on the
  * shared storage the tables already live on, mutated under the same
  * cross-process lock machinery every table commit uses — an
  * object-store deployment swaps this file for a REST/Hive catalog
  * CAS, exactly the substitution real Iceberg makes, with no caller
  * change (names in, table roots out). The reference's per-branch
  * scoping maps to [[IcebergLite]]'s ref layer: a catalog entry names
  * the table; branches/tags live inside the table's own metadata.
  *
  * Layout: `<root>/catalog.json` = `{"databases": {db: {table:
  * path}}}`; paths are absolute or root-relative. Registered tables
  * are ordinary [[IcebergLite]] roots — every table op (append, read,
  * time travel, branching, changelog) works on the resolved path.
  */
object Catalog {
  private implicit val formats: Formats = DefaultFormats

  private def catalogFile(root: String) = Paths.get(root, "catalog.json")

  /** Initialize an empty catalog (idempotent). The `metadata/` dir
    * exists only to host the shared commit-lock file. */
  def init(root: String): Unit = {
    Files.createDirectories(Paths.get(root, "metadata"))
    if (!Files.exists(catalogFile(root)))
      IcebergLite.atomicWrite(catalogFile(root), """{"databases": {}}""")
  }

  /** Parse cache keyed by (mtime, size): analyzer rules and the REST
    * server resolve names many times per statement/request, and the
    * document only changes under the commit lock. In-process mutations
    * refresh the cache directly at write; cross-process writers are
    * picked up through the key — a same-instant same-size rewrite by
    * ANOTHER process is the only (adversarial) staleness window. */
  private val parseCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((java.nio.file.attribute.FileTime, Long), Map[String, Map[String, String]])]()

  private def readAll(root: String): Map[String, Map[String, String]] = {
    val f = catalogFile(root)
    if (!Files.exists(f)) return Map.empty
    val key = (Files.getLastModifiedTime(f), Files.size(f))
    val cached = parseCache.get(root)
    if (cached != null && cached._1 == key) return cached._2
    val parsed = parseJson(f)
    parseCache.put(root, (key, parsed))
    parsed
  }

  private def parseJson(f: java.nio.file.Path): Map[String, Map[String, String]] = {
    org.json4s.jackson.JsonMethods.parse(
      Files.readString(f)) \ "databases" match {
      case JObject(dbs) => dbs.map { case (db, ts) =>
        db -> (ts match {
          case JObject(fields) => fields.collect {
            case (t, JString(p)) => t -> p
          }.toMap
          case _ => Map.empty[String, String]
        })
      }.toMap
      case _ => Map.empty
    }
  }

  private def writeAll(root: String,
      dbs: Map[String, Map[String, String]]): Unit = {
    def jstr(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val body = dbs.toSeq.sortBy(_._1).map { case (db, ts) =>
      s"${jstr(db)}: " + ts.toSeq.sortBy(_._1)
        .map { case (t, p) => s"${jstr(t)}: ${jstr(p)}" }
        .mkString("{", ", ", "}")
    }.mkString("{", ", ", "}")
    val f = catalogFile(root)
    // lock-free readers (analyzer rules, REST server) may open this at
    // any instant — same tmp + ATOMIC_MOVE discipline as the
    // v0.metadata.json pointer flip, never an in-place truncate+write
    IcebergLite.atomicWrite(f, s"""{"databases": $body}""")
    parseCache.put(root, ((Files.getLastModifiedTime(f), Files.size(f)), dbs))
  }

  def listDatabases(root: String): Seq[String] =
    readAll(root).keys.toSeq.sorted

  def createDatabase(root: String, db: String): Unit =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(!all.contains(db), s"database $db already exists")
      writeAll(root, all + (db -> Map.empty))
    }

  /** Deregister an EMPTY database (callers drop its tables first —
    * cascade policy is theirs, not the catalog's). */
  def dropDatabase(root: String, db: String): Unit =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(all.contains(db), s"database $db does not exist")
      require(all(db).isEmpty, s"database $db still has tables")
      writeAll(root, all - db)
    }

  def listTables(root: String, db: String): Seq[String] = {
    val all = readAll(root)
    require(all.contains(db), s"database $db does not exist")
    all(db).keys.toSeq.sorted
  }

  /** Register (and physically initialize) a table. Default location
    * `<root>/<db>/<name>`; `location` overrides — registering an
    * EXISTING table root adopts it, the external-table pattern. */
  def createTable(root: String, db: String, name: String,
      location: Option[String] = None): String =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(all.contains(db), s"database $db does not exist")
      require(!all(db).contains(name), s"table $db.$name already exists")
      require(!readViews(root).getOrElse(db, Map.empty).contains(name),
        s"view $db.$name already exists (views and tables share the namespace)")
      val path = location.getOrElse(Paths.get(root, db, name).toString)
      IcebergLite.createTable(path)
      writeAll(root, all + (db -> (all(db) + (name -> path))))
      path
    }

  /** Resolve a table name to its root — the `get_table` lookup every
    * engine call starts from. */
  def tablePath(root: String, db: String, name: String): String = {
    val all = readAll(root)
    require(all.contains(db) && all(db).contains(name),
      s"table $db.$name does not exist")
    all(db)(name)
  }

  /** The table's current LOGICAL schema (the reference's
    * get_table/table_to_arrow_schema): the snapshot's recorded data
    * schema with renames applied; None for an empty or pre-tracking
    * table. */
  def tableSchema(root: String, db: String,
      name: String): Option[org.apache.spark.sql.types.StructType] = {
    val path = tablePath(root, db, name)
    IcebergLite.tableSchema(path).map { s =>
      val rmap = IcebergLite.renames(path)
      org.apache.spark.sql.types.StructType(
        s.fields.map(f => f.copy(name = rmap.getOrElse(f.name, f.name))))
    }
  }

  /** Read a table by NAME — sugar over resolve + [[IcebergLite.read]]. */
  def readTable(spark: SparkSession, root: String, db: String,
      name: String): DataFrame =
    IcebergLite.read(spark, tablePath(root, db, name))

  def renameTable(root: String, db: String, from: String, to: String): Unit =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(all.contains(db) && all(db).contains(from),
        s"table $db.$from does not exist")
      require(!all(db).contains(to), s"table $db.$to already exists")
      // a rename moves the NAME only — the table root is immutable
      // identity (real catalogs behave the same; data never moves)
      writeAll(root, all + (db -> (all(db) - from + (to -> all(db)(from)))))
    }

  /** Deregister; `purge = true` also deletes the table tree (refuses
    * for external tables registered OUTSIDE the catalog root — the
    * catalog never owns data it did not place). */
  def dropTable(root: String, db: String, name: String,
      purge: Boolean = false): Unit =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(all.contains(db) && all(db).contains(name),
        s"table $db.$name does not exist")
      val path = all(db)(name)
      if (purge) {
        val rootAbs = Paths.get(root).toAbsolutePath.normalize
        val pathAbs = Paths.get(path).toAbsolutePath.normalize
        require(pathAbs.startsWith(rootAbs),
          s"refusing to purge external table at $path (outside $root)")
        if (Files.exists(pathAbs))
          Files.walk(pathAbs).iterator().asScala.toSeq.reverse
            .foreach(Files.deleteIfExists(_))
      }
      writeAll(root, all + (db -> (all(db) - name)))
    }

  // ------------------------------------------------------------ views
  /** A persisted SQL view — the metastore-level object the reference's
    * model carries as table_type VIRTUAL_VIEW + viewOriginalText
    * (branching-metastore Table.java:38-61). `sql` is the original
    * query text; `catalog` is the catalog NAME the view was created
    * under (unqualified table references in the text re-scope to
    * `catalog.db` at read time — the expansion the reference stores
    * as viewExpandedText); `schemaJson` is the analysis-time schema
    * (aliases applied) so name-only consumers (REST) can serve
    * columns without a SQL engine. */
  case class ViewDoc(sql: String, catalog: String, aliases: Seq[String],
      comment: Option[String], properties: Map[String, String],
      schemaJson: String)

  private def viewsFile(root: String) = Paths.get(root, "views.json")

  private val viewParseCache =
    new java.util.concurrent.ConcurrentHashMap[String, ((java.nio.file.attribute.FileTime, Long), Map[String, Map[String, ViewDoc]])]()

  private def readViews(root: String): Map[String, Map[String, ViewDoc]] = {
    val f = viewsFile(root)
    if (!Files.exists(f)) return Map.empty
    val key = (Files.getLastModifiedTime(f), Files.size(f))
    val cached = viewParseCache.get(root)
    if (cached != null && cached._1 == key) return cached._2
    val parsed = (org.json4s.jackson.JsonMethods.parse(Files.readString(f)) \ "views")
      .extractOrElse[Map[String, Map[String, ViewDoc]]](Map.empty)
    viewParseCache.put(root, (key, parsed))
    parsed
  }

  private def writeViews(root: String,
      views: Map[String, Map[String, ViewDoc]]): Unit = {
    val f = viewsFile(root)
    // same lock-free-reader discipline as catalog.json
    IcebergLite.atomicWrite(f, org.json4s.jackson.Serialization.write(
      Map("views" -> views))(DefaultFormats))
    viewParseCache.put(root, ((Files.getLastModifiedTime(f), Files.size(f)), views))
  }

  def listViews(root: String, db: String): Seq[String] = {
    require(readAll(root).contains(db), s"database $db does not exist")
    readViews(root).getOrElse(db, Map.empty).keys.toSeq.sorted
  }

  def viewDoc(root: String, db: String, name: String): Option[ViewDoc] =
    readViews(root).getOrElse(db, Map.empty).get(name)

  /** Register a view. Refuses a name a TABLE already holds (one
    * namespace, like every real metastore); `replace` overwrites an
    * existing view, `allowExisting` no-ops on an existing view
    * (the IF NOT EXISTS decision must live INSIDE the commit lock —
    * a pre-check outside it races a concurrent CREATE), otherwise an
    * existing name refuses. */
  def createView(root: String, db: String, name: String, doc: ViewDoc,
      replace: Boolean = false, allowExisting: Boolean = false): Unit =
    IcebergLite.withCommitLock(root) {
      val all = readAll(root)
      require(all.contains(db), s"database $db does not exist")
      val views = readViews(root)
      val exists = views.getOrElse(db, Map.empty).contains(name) ||
        all(db).contains(name)
      // IF NOT EXISTS no-ops on ANY existing name — view OR table —
      // before the table-namespace refusal, matching Spark's
      // CreateViewCommand (allowExisting is checked first there too)
      if (exists && allowExisting && !replace) return
      require(!all(db).contains(name),
        s"table $db.$name already exists (views and tables share the namespace)")
      require(replace || !exists, s"view $db.$name already exists")
      writeViews(root, views + (db -> (views.getOrElse(db, Map.empty) + (name -> doc))))
    }

  def dropView(root: String, db: String, name: String): Boolean =
    IcebergLite.withCommitLock(root) {
      val views = readViews(root)
      val had = views.getOrElse(db, Map.empty).contains(name)
      if (had) writeViews(root, views + (db -> (views(db) - name)))
      had
    }
}
