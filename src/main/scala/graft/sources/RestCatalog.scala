package graft.sources

import java.net.InetSocketAddress
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._

/** REST metastore — the deployment transport the reference's
  * `BranchingMetastoreClient` speaks (`/root/reference/src/metastore/
  * mod.rs:172-275`): `GET /branch/{id}/databases`,
  * `/branch/{id}/database/{db}`, `/branch/{id}/database/{db}/tables`,
  * `/branch/{id}/table/{db}/{table}`, with the same response shapes
  * (`databases`, `tables[{table_name,table_type,comment}]`, and a
  * table document carrying `columns[{name,data_type,nullable}]` +
  * `table_location`/`table_format`), 404 → table-not-found, and
  * retry-with-exponential-backoff on transport errors.
  *
  * The server half fronts the file-backed [[Catalog]] — the exact
  * substitution real deployments make (metadata service in front of
  * shared storage; data never moves through it). Branch scoping maps
  * the reference's branch-id path segment onto the engine's ref
  *  layer: `main` serves every table; any other branch id serves the
  * tables whose Iceberg metadata carries a branch of that name (their
  * schema resolved AS OF that branch's head), because in this engine
  * branching is per-table table-format state, not a metastore fork.
  * The client half resolves names → locations, then reads through
  * [[IcebergLite]] exactly as local resolution would — the metastore
  * is O(names) control-plane traffic however large the tables are.
  */
object RestCatalog {
  private implicit val formats: Formats = DefaultFormats

  private def jstr(s: String) =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  // ------------------------------------------------------------ server
  final class Server private[RestCatalog] (
      private val http: com.sun.net.httpserver.HttpServer) {
    def port: Int = http.getAddress.getPort
    def baseUrl: String = s"http://127.0.0.1:$port"
    def stop(): Unit = http.stop(0)
  }

  /** Serve `root`'s catalog on an ephemeral (or given) port. Requests
    * run on a cached thread pool (the default null executor would
    * serialize every client behind the slowest request — the ref
    * advance under a commit lock must not block concurrent reads). */
  def serve(root: String, port: Int = 0): Server = {
    val http = com.sun.net.httpserver.HttpServer.create(
      new InetSocketAddress("127.0.0.1", port), 0)
    http.setExecutor(java.util.concurrent.Executors.newCachedThreadPool(
      (r: Runnable) => { val t = new Thread(r, "graft-rest"); t.setDaemon(true); t }))
    http.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val (status, body) =
        try route(root, ex.getRequestMethod, ex.getRequestURI.getPath,
          Option(ex.getRequestURI.getQuery).getOrElse(""))
        catch { case e: Exception => (500, s"""{"error": ${
          jstr(Option(e.getMessage).getOrElse(e.getClass.getName))}}""") }
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.getResponseHeaders.add("Content-Type", "application/json")
      ex.sendResponseHeaders(status, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    http.start()
    new Server(http)
  }

  /** `main` sees everything; another branch id sees the tables whose
    * OWN metadata carries that branch (per-table refs, see class doc). */
  private def visible(root: String, branch: String, db: String, t: String): Boolean =
    branch == "main" ||
      IcebergLite.branches(Catalog.tablePath(root, db, t)).contains(branch)

  private def branchSnapshot(root: String, branch: String,
      db: String, t: String): Option[Long] =
    if (branch == "main") None
    else IcebergLite.branches(Catalog.tablePath(root, db, t)).get(branch)

  /** Tables (db, name, path) carrying branch ref `branch`. */
  private def branchTables(root: String, branch: String): Seq[(String, String, String)] =
    for {
      db <- Catalog.listDatabases(root)
      t <- Catalog.listTables(root, db)
      p = Catalog.tablePath(root, db, t)
      if IcebergLite.branches(p).contains(branch)
    } yield (db, t, p)

  /** Run `body` holding the commit lock of EVERY table in `paths`,
    * acquired in one global (sorted) order so two multi-table routes
    * can never deadlock each other. The write routes need this
    * because their check-then-act spans tables: a per-call lock taken
    * inside `advanceBranch` alone leaves the CHECK outside it, and
    * under the server's concurrent executor two writers could both
    * pass the check and silently overwrite each other. Tables whose
    * metadata directory does not exist yet (declared, never written)
    * are skipped — they cannot carry refs and have no lock file home. */
  private def withTableLocks[A](paths: Seq[String])(body: => A): A =
    paths.distinct.sorted
      .filter(p => java.nio.file.Files.isDirectory(
        java.nio.file.Paths.get(s"$p/metadata")))
      .foldRight(() => body)((p, b) =>
        () => IcebergLite.withCommitLock(p)(b())).apply()

  private def qparams(query: String): Map[String, String] =
    query.split("&").filter(_.contains("=")).map { kv =>
      val Array(k, v) = kv.split("=", 2)
      k -> java.net.URLDecoder.decode(v, StandardCharsets.UTF_8)
    }.toMap

  /** The WRITE surface — the reference's branch operations
    * (BranchingMetastore.java:63-80: createBranch-with-parent,
    * mergeBranch-with-conflict, deleteBranch) plus a CAS commit route,
    * realized over per-table refs:
    *  - `POST /branch/{id}/create?parent={pid}` forks {id} from the
    *    parent branch's head on EVERY table visible on the parent
    *    (409 when {id} already exists anywhere — the reference's
    *    BranchAlreadyExistsException; 404 for a missing parent);
    *  - `POST /branch/{id}/table/{db}/{t}/commit?snapshot={sid}&
    *    expected_head={h}` advances the branch ref iff its head still
    *    equals expected_head — a concurrent change answers 409, the
    *    reference's merge-conflict analogue at commit granularity.
    *    Data files never pass through the server: the client lands
    *    them on storage first, then moves the POINTER here;
    *  - `POST /branch/{src}/merge/{target}` merges per table:
    *    target `main` fast-forwards the main pointer (divergence →
    *    409 MergeConflict naming the table, the reference's
    *    "has diverged between branches"); a branch target advances
    *    iff its head is an ancestor of the source head;
    *  - `DELETE /branch/{id}` drops the ref from every table. */
  private def route(root: String, method: String, path: String,
      query: String): (Int, String) = {
    val parts = path.split("/").filter(_.nonEmpty).toList
    (method, parts) match {
      case ("POST", "branch" :: branch :: "create" :: Nil) =>
        val parent = qparams(query).getOrElse("parent", "main")
        if (branch == "main")
          return (409, """{"error": "branch main already exists"}""")
        val all =
          for { db <- Catalog.listDatabases(root); t <- Catalog.listTables(root, db) }
            yield (db, t, Catalog.tablePath(root, db, t))
        // every check and every fork under ALL table locks: a
        // duplicate found after some tables forked (same-named TAG, or
        // a concurrent create racing this one) would otherwise leave a
        // partial branch AND a 500 the client retries into a 409
        // blaming the caller's own wreckage
        withTableLocks(all.map(_._3)) {
          val clash = all.exists { case (_, _, p) =>
            IcebergLite.branches(p).contains(branch) ||
              IcebergLite.tags(p).contains(branch)
          }
          if (clash)
            return (409, s"""{"error": "ref $branch already exists"}""")
          val parentTables =
            if (parent == "main") all
            else all.filter { case (_, _, p) =>
              IcebergLite.branches(p).contains(parent) }
          if (parent != "main" && parentTables.isEmpty)
            return (404, s"""{"error": "parent branch $parent not found"}""")
          // fork at the PARENT's head per table; empty tables (nothing
          // to branch) are skipped, matching the table layer's refusal
          val forked = parentTables.flatMap { case (db, t, p) =>
            val head =
              if (parent == "main") IcebergLite.currentSnapshotId(p)
              else IcebergLite.branches(p).get(parent)
            head.map { h => IcebergLite.createBranch(p, branch, Some(h)); s"$db.$t" }
          }
          (200, s"""{"branch_id": ${jstr(branch)}, "parent_id": ${jstr(parent)}, """ +
            s""""tables": ${forked.map(jstr).mkString("[", ", ", "]")}}""")
        }
      case ("POST", "branch" :: branch :: "table" :: db :: t :: "commit" :: Nil) =>
        val q = qparams(query)
        // malformed numbers are the CLIENT's permanent error — answer
        // 400, never let NumberFormatException surface as a retryable
        // 500 the client backs off through before failing anyway
        val snap = q.get("snapshot") match {
          case None => return (400, """{"error": "snapshot parameter required"}""")
          case Some(raw) => raw.toLongOption.getOrElse(
            return (400, s"""{"error": ${jstr(s"snapshot must be a number, got $raw")}}"""))
        }
        val expectedHead = q.get("expected_head").map { raw =>
          raw.toLongOption.getOrElse(
            return (400, """{"error": "expected_head must be a number"}"""))
        }
        if (!Catalog.listDatabases(root).contains(db) ||
            !Catalog.listTables(root, db).contains(t))
          return (404, s"""{"error": "table $db.$t not found"}""")
        val p = Catalog.tablePath(root, db, t)
        // read-compare-advance is ONE critical section: two writers
        // who both read the same head must not both pass the CAS check
        // (the executor is concurrent — losing a commit with a 200 is
        // exactly what expected_head exists to prevent)
        IcebergLite.withCommitLock(p) {
          val current = IcebergLite.branches(p).get(branch).getOrElse(
            return (404, s"""{"error": "branch $branch not found on $db.$t"}"""))
          expectedHead.foreach { exp =>
            if (exp != current)
              return (409, s"""{"error": "concurrent change on $db.$t: branch """ +
                s"""$branch is at $current, expected $exp"}""")
          }
          IcebergLite.advanceBranch(p, branch, Some(snap))
          (200, s"""{"branch_id": ${jstr(branch)}, "table": ${jstr(s"$db.$t")}, """ +
            s""""head": $snap}""")
        }
      case ("POST", "branch" :: src :: "merge" :: target :: Nil) =>
        val carrying = branchTables(root, src)
        if (carrying.isEmpty)
          return (404, s"""{"error": "branch $src not found"}""")
        // conflict check FIRST across every table, then apply — a
        // half-merged catalog is worse than a refused one (the
        // reference checks all conflicts before copying too). BOTH
        // phases run under every carrying table's commit lock: a
        // concurrent commit landing between check and apply would
        // either be silently overwritten (branch target) or make a
        // later table throw mid-loop (main target) — the exact
        // half-merge the two-phase structure claims to prevent.
        withTableLocks(carrying.map(_._3)) {
          val heads = carrying.map { case (db, t, p) =>
            val srcHead = IcebergLite.branches(p).get(src).getOrElse(
              return (409, s"""{"error": "branch $src vanished from $db.$t """ +
                s"""during merge"}"""))
            if (target == "main") {
              if (!ancestorsOf(p, srcHead).contains(
                  IcebergLite.currentSnapshotId(p).getOrElse(srcHead)))
                return (409, s"""{"error": "merge conflict: table $db.$t has """ +
                  s"""diverged between branches"}""")
            } else {
              val tgtHead = IcebergLite.branches(p).get(target).getOrElse(
                return (404, s"""{"error": "branch $target not found on $db.$t"}"""))
              if (!ancestorsOf(p, srcHead).contains(tgtHead))
                return (409, s"""{"error": "merge conflict: table $db.$t has """ +
                  s"""diverged between branches"}""")
            }
            (db, t, p, srcHead)
          }
          val merged = heads.map { case (db, t, p, srcHead) =>
            if (target == "main") IcebergLite.fastForwardMain(p, src)
            else IcebergLite.advanceBranch(p, target, Some(srcHead))
            s"$db.$t"
          }
          (200, s"""{"source": ${jstr(src)}, "target": ${jstr(target)}, """ +
            s""""merged_tables": ${merged.map(jstr).mkString("[", ", ", "]")}}""")
        }
      case ("DELETE", "branch" :: branch :: Nil) =>
        val carrying = branchTables(root, branch)
        if (carrying.isEmpty)
          return (404, s"""{"error": "branch $branch not found"}""")
        carrying.foreach { case (_, _, p) => IcebergLite.dropBranch(p, branch) }
        (200, s"""{"deleted": ${jstr(branch)}, "tables": ${carrying.size}}""")
      case ("GET", getParts) => routeGet(root, getParts)
      case _ => (404, """{"error": "no such route"}""")
    }
  }

  /** Snapshot ancestor chain of `head` (inclusive), bounded by
    * existing snapshot files like fastForwardMain's walk. */
  private def ancestorsOf(tablePath: String, head: Long): Set[Long] = {
    // ONE directory listing for the whole walk — per-ancestor listing
    // is O(chain × dir-entries), and the merge route calls this for
    // every carrying table
    val committed = IcebergLite.snapshots(tablePath).toSet
    val chain = scala.collection.mutable.Set.empty[Long]
    var cursor: Option[Long] = Some(head)
    while (cursor.nonEmpty && committed.contains(cursor.get)) {
      chain += cursor.get
      cursor = IcebergLite.parentSnapshotId(tablePath, cursor.get)
    }
    chain.toSet
  }

  private def routeGet(root: String, parts: List[String]): (Int, String) = {
    parts match {
      case "branch" :: branch :: "databases" :: Nil =>
        val dbs = Catalog.listDatabases(root).filter(db =>
          branch == "main" || Catalog.listTables(root, db)
            .exists(visible(root, branch, db, _)))
        (200, dbs.map(jstr).mkString("""{"databases": [""", ", ", "]}"))
      case "branch" :: branch :: "database" :: db :: Nil =>
        // same branch-scope contract as the /databases list: a db none
        // of whose tables are visible on this branch is not found here
        if (!Catalog.listDatabases(root).contains(db) ||
            (branch != "main" && !Catalog.listTables(root, db)
              .exists(visible(root, branch, db, _))))
          (404, s"""{"error": "database $db not found"}""")
        else (200, s"""{"database_name": ${jstr(db)}, "comment": null}""")
      case "branch" :: branch :: "database" :: db :: "tables" :: Nil =>
        if (!Catalog.listDatabases(root).contains(db))
          (404, s"""{"error": "database $db not found"}""")
        else {
          val ts = Catalog.listTables(root, db).filter(visible(root, branch, db, _))
            .map(t => s"""{"table_name": ${jstr(t)}, "table_type": "TABLE", "comment": null}""")
          // persisted views list alongside tables as VIRTUAL_VIEW —
          // the reference's model (Table.java tableType + Hive's
          // convention); views carry no branch refs, so only main
          // serves them
          val vs =
            if (branch != "main") Nil
            else Catalog.listViews(root, db).map(v =>
              s"""{"table_name": ${jstr(v)}, "table_type": "VIRTUAL_VIEW", "comment": null}""")
          (200, (ts ++ vs).mkString("""{"tables": [""", ", ", "]}"))
        }
      case "branch" :: branch :: "table" :: db :: t :: Nil
          if branch == "main" && Catalog.listDatabases(root).contains(db) &&
            Catalog.viewDoc(root, db, t).isDefined =>
        // a VIEW's document: columns from the analysis-time schema,
        // the original text as the reference's viewOriginalText
        // (Table.java:38), no storage location — data lives in the
        // tables the text references
        val doc = Catalog.viewDoc(root, db, t).get
        val schema = org.apache.spark.sql.types.DataType.fromJson(doc.schemaJson)
          .asInstanceOf[org.apache.spark.sql.types.StructType]
        val cols = schema.fields.toSeq.map(f =>
          s"""{"name": ${jstr(f.name)}, "data_type": ${jstr(f.dataType.catalogString)}, """ +
            s""""nullable": ${f.nullable}, "comment": null}""")
        (200,
          s"""{"table_name": ${jstr(t)}, "database_name": ${jstr(db)}, """ +
          s""""table_type": "VIRTUAL_VIEW", "columns": ${cols.mkString("[", ", ", "]")}, """ +
          s""""table_location": null, "table_format": null, """ +
          s""""view_original_text": ${jstr(doc.sql)}}""")
      case "branch" :: branch :: "table" :: db :: t :: Nil =>
        val exists = Catalog.listDatabases(root).contains(db) &&
          Catalog.listTables(root, db).contains(t) && visible(root, branch, db, t)
        if (!exists) (404, s"""{"error": "table $db.$t not found"}""")
        else {
          val location = Catalog.tablePath(root, db, t)
          // schema AS OF the requested branch's head — the reference's
          // branch scoping, realized through per-table refs
          val snap = branchSnapshot(root, branch, db, t)
          val schema = IcebergLite.tableSchema(location, snap).map { s =>
            val rmap = IcebergLite.renames(location, snap)
            org.apache.spark.sql.types.StructType(
              s.fields.map(f => f.copy(name = rmap.getOrElse(f.name, f.name))))
          }
          val cols = schema.map(_.fields.toSeq).getOrElse(Nil).map(f =>
            s"""{"name": ${jstr(f.name)}, "data_type": ${jstr(f.dataType.catalogString)}, """ +
              s""""nullable": ${f.nullable}, "comment": null}""")
          (200,
            s"""{"table_name": ${jstr(t)}, "database_name": ${jstr(db)}, """ +
            s""""table_type": "TABLE", "columns": ${cols.mkString("[", ", ", "]")}, """ +
            s""""table_location": ${jstr(location)}, "table_format": "iceberg"}""")
        }
      case _ => (404, """{"error": "no such route"}""")
    }
  }

  // ------------------------------------------------------------ client
  case class DatabaseMetadata(databaseName: String, comment: Option[String])
  case class TableInfo(tableName: String, tableType: String)
  case class ColumnMetadata(name: String, dataType: String, nullable: Boolean)
  /** Location/format are optional exactly as in the reference's
    * TableMetadata (mod.rs:353-361) — a VIRTUAL_VIEW has neither;
    * `viewOriginalText` mirrors the reference's view model. */
  case class TableMetadata(tableName: String, databaseName: String,
      tableType: String, columns: Seq[ColumnMetadata],
      tableLocation: Option[String], tableFormat: Option[String],
      viewOriginalText: Option[String] = None)

  class TableNotFound(msg: String) extends RuntimeException(msg)
  /** 409 from the write surface — the reference's
    * MergeConflictException / BranchAlreadyExistsException family: a
    * definitive answer about concurrent state, never retried. */
  class ConflictException(msg: String) extends RuntimeException(msg)

  /** Percent-encode ONE path segment (URLEncoder is form-encoding:
    * its '+' for space would decode as a literal plus in a URI path). */
  private def seg(s: String): String =
    java.net.URLEncoder.encode(s, StandardCharsets.UTF_8).replace("+", "%20")

  /** Client with the reference's reliability contract: `maxRetries`
    * attempts, exponential backoff `retryDelayMs → maxRetryDelayMs`,
    * per-request timeout; a 404 on get_table surfaces as
    * [[TableNotFound]] immediately (the reference's special case —
    * missing tables are an answer, not a transport fault). */
  class Client(baseUrl: String, branchId: String = "main",
      maxRetries: Int = 3, retryDelayMs: Long = 100,
      maxRetryDelayMs: Long = 5000, timeoutSecs: Long = 30) {
    private val http = HttpClient.newBuilder()
      .connectTimeout(java.time.Duration.ofSeconds(timeoutSecs)).build()

    private def get(url: String, notFound: String => Exception): JValue =
      send(url, "GET", notFound)

    /** One request with the reliability contract: 2xx parses, 404 and
      * 409 are ANSWERS (no retry — a 409 retried could double-apply a
      * pointer move), 5xx and transport faults retry with backoff. */
    private def send(url: String, method: String,
        notFound: String => Exception): JValue = {
      var delay = retryDelayMs
      var last: Exception = null
      var attempt = 0
      while (attempt <= maxRetries) {
        try {
          val b = HttpRequest.newBuilder(java.net.URI.create(url))
            .timeout(java.time.Duration.ofSeconds(timeoutSecs))
          val resp = http.send(
            (method match {
              case "GET" => b.GET()
              case "POST" => b.POST(HttpRequest.BodyPublishers.noBody())
              case "DELETE" => b.DELETE()
            }).build(),
            HttpResponse.BodyHandlers.ofString())
          resp.statusCode() match {
            case ok if ok / 100 == 2 =>
              return org.json4s.jackson.JsonMethods.parse(resp.body())
            case 404 => throw notFound(url) // answer, not fault: no retry
            case 409 => throw new ConflictException(
              (org.json4s.jackson.JsonMethods.parse(resp.body()) \ "error")
                .extractOpt[String].getOrElse(s"$url -> HTTP 409"))
            case s if s / 100 == 5 =>
              last = new RuntimeException(s"$url -> HTTP $s") // retryable
            case s => throw new RuntimeException(s"$url -> HTTP $s")
          }
        } catch {
          case e: TableNotFound => throw e
          case e: ConflictException => throw e
          case e: java.io.IOException => last = e // transport fault: retry
        }
        attempt += 1
        if (attempt <= maxRetries) {
          Thread.sleep(delay)
          delay = math.min(delay * 2, maxRetryDelayMs)
        }
      }
      throw new RuntimeException(s"max retries exceeded for $url", last)
    }

    private def notFoundErr(url: String): Exception = new TableNotFound(url)

    def listDatabases(): Seq[String] =
      (get(s"$baseUrl/branch/${seg(branchId)}/databases", notFoundErr) \ "databases")
        .extract[Seq[String]]

    /** The reference's `get_database` (mod.rs:184-192): database
      * metadata, branch-scoped like the list endpoint. */
    def getDatabase(db: String): DatabaseMetadata = {
      val j = get(s"$baseUrl/branch/${seg(branchId)}/database/${seg(db)}",
        u => new TableNotFound(s"database $db not found ($u)"))
      DatabaseMetadata((j \ "database_name").extract[String],
        (j \ "comment").extractOpt[String])
    }

    def listTables(db: String): Seq[TableInfo] =
      (get(s"$baseUrl/branch/${seg(branchId)}/database/${seg(db)}/tables", notFoundErr) \ "tables") match {
        case JArray(ts) => ts.map(t => TableInfo(
          (t \ "table_name").extract[String], (t \ "table_type").extract[String]))
        case _ => Nil
      }

    def getTable(db: String, table: String): TableMetadata = {
      val j = get(s"$baseUrl/branch/${seg(branchId)}/table/${seg(db)}/${seg(table)}",
        u => new TableNotFound(s"table $db.$table not found ($u)"))
      TableMetadata(
        (j \ "table_name").extract[String],
        (j \ "database_name").extract[String],
        (j \ "table_type").extractOrElse[String]("TABLE"),
        (j \ "columns") match {
          case JArray(cs) => cs.map(c => ColumnMetadata(
            (c \ "name").extract[String], (c \ "data_type").extract[String],
            (c \ "nullable").extract[Boolean]))
          case _ => Nil
        },
        (j \ "table_location").extractOpt[String],
        (j \ "table_format").extractOpt[String],
        (j \ "view_original_text").extractOpt[String])
    }

    /** Fork a new branch from `parent`'s head on every parent-visible
      * table (the reference's createBranch-with-parentId). The CLIENT
      * branch id is the new branch. */
    def createBranch(parent: String = "main"): Seq[String] =
      (send(s"$baseUrl/branch/${seg(branchId)}/create?parent=${seg(parent)}",
        "POST", notFoundErr) \ "tables").extract[Seq[String]]

    /** CAS-advance this branch's head on one table to `snapshotId`:
      * refused with [[ConflictException]] when the head moved past
      * `expectedHead` (a concurrent writer won). Data files are
      * already on storage — only the POINTER moves here. */
    def commitTable(db: String, table: String, snapshotId: Long,
        expectedHead: Option[Long] = None): Long = {
      val exp = expectedHead.map(h => s"&expected_head=$h").getOrElse("")
      (send(s"$baseUrl/branch/${seg(branchId)}/table/${seg(db)}/${seg(table)}" +
        s"/commit?snapshot=$snapshotId$exp", "POST",
        u => new TableNotFound(s"table $db.$table not found ($u)")) \ "head")
        .extract[Long]
    }

    /** Merge this branch into `target` across every carrying table —
      * all-or-nothing: any diverged table refuses the WHOLE merge with
      * [[ConflictException]] (the reference's MergeConflictException). */
    def mergeBranch(target: String = "main"): Seq[String] =
      (send(s"$baseUrl/branch/${seg(branchId)}/merge/${seg(target)}",
        "POST", notFoundErr) \ "merged_tables").extract[Seq[String]]

    /** Drop this branch's ref from every carrying table. */
    def deleteBranch(): Int =
      (send(s"$baseUrl/branch/${seg(branchId)}", "DELETE", notFoundErr) \ "tables")
        .extract[Int]

    /** Resolve by name over HTTP, then read DIRECTLY from storage —
      * the metastore never proxies data. A non-main branch reads the
      * branch head's snapshot. */
    def readTable(spark: SparkSession, db: String, table: String): DataFrame = {
      val meta = getTable(db, table)
      val loc = meta.tableLocation.getOrElse(throw new IllegalArgumentException(
        s"$db.$table is a ${meta.tableType} with no storage location; " +
          "views read through the SQL face"))
      val snap =
        if (branchId == "main") None
        else Some(IcebergLite.resolveRef(loc, branchId))
      IcebergLite.read(spark, loc, snap)
    }
  }
}
