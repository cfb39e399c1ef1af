package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Catalog, IcebergLite, RestCatalog}

/** REST metastore round-trip (reference metastore/mod.rs:172-275):
  * server fronts the file catalog, client speaks the reference's
  * endpoint + response shapes with its reliability contract (retry
  * with backoff, 404-is-an-answer), branch scoping resolves through
  * per-table refs. */
class RestCatalogSpec extends AnyFunSuite {
  import TestSpark._

  private lazy val fixture: (String, RestCatalog.Server, RestCatalog.Client) = {
    val root = Files.createTempDirectory("graft_restcat").toString
    val s = spark
    import s.implicits._
    Catalog.init(root)
    Catalog.createDatabase(root, "sales")
    Catalog.createDatabase(root, "empty")
    IcebergLite.append(spark, Catalog.createTable(root, "sales", "orders"),
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v"))
    IcebergLite.append(spark, Catalog.createTable(root, "sales", "dim"),
      Seq((1L, 10.0)).toDF("id", "w"))
    val server = RestCatalog.serve(root)
    (root, server, new RestCatalog.Client(server.baseUrl))
  }

  test("list/get endpoints serve the reference's response shapes") {
    val (_, _, client) = fixture
    assert(client.listDatabases() == Seq("empty", "sales"))
    assert(client.listTables("sales").map(_.tableName) == Seq("dim", "orders"))
    val meta = client.getTable("sales", "orders")
    assert(meta.databaseName == "sales" && meta.tableFormat.contains("iceberg"))
    assert(meta.columns.map(c => (c.name, c.dataType)) ==
      Seq(("id", "bigint"), ("v", "string")))
    assert(meta.tableLocation.nonEmpty)
  }

  test("readTable resolves over HTTP and reads from storage directly") {
    val (_, _, client) = fixture
    val df = client.readTable(spark, "sales", "orders")
    assert(df.count() == 3)
    assert(df.columns.toSeq == Seq("id", "v"))
  }

  test("404 is an answer: TableNotFound without retries; transport faults retry") {
    val (_, server, client) = fixture
    intercept[RestCatalog.TableNotFound](client.getTable("sales", "nope"))
    intercept[RestCatalog.TableNotFound](client.getTable("nodb", "orders"))
    // a dead endpoint exhausts retries with backoff, then reports
    val t0 = System.nanoTime()
    val dead = new RestCatalog.Client(
      s"http://127.0.0.1:1", maxRetries = 2, retryDelayMs = 20)
    val e = intercept[RuntimeException](dead.listDatabases())
    assert(e.getMessage.contains("max retries"))
    assert((System.nanoTime() - t0) / 1e6 >= 60, "20ms + 40ms backoff must elapse")
    assert(server.port > 0)
  }

  test("branch scoping: a non-main branch sees branch-bearing tables as of the branch head") {
    val (root, server, _) = fixture
    val s = spark
    import s.implicits._
    val path = Catalog.tablePath(root, "sales", "orders")
    IcebergLite.createBranch(path, "audit")
    // main advances past the branch point with a new column
    IcebergLite.append(spark, path,
      Seq((9L, "z", "extra")).toDF("id", "v", "note"))
    val audit = new RestCatalog.Client(server.baseUrl, branchId = "audit")
    // only the branch-bearing table is visible on the branch
    assert(audit.listTables("sales").map(_.tableName) == Seq("orders"))
    // schema AS OF the branch head: no `note` column
    assert(audit.getTable("sales", "orders").columns.map(_.name) == Seq("id", "v"))
    assert(audit.readTable(spark, "sales", "orders").count() == 3)
    // main sees the post-branch world
    val main = new RestCatalog.Client(server.baseUrl)
    assert(main.readTable(spark, "sales", "orders").count() == 4)

    // the single-database GET honors the same branch scope as the
    // list: a db with no branch-visible tables is 404 on that branch,
    // while the db that has one resolves
    assert(audit.listDatabases() == Seq("sales"))
    assert(audit.getDatabase("sales").databaseName == "sales")
    intercept[RestCatalog.TableNotFound](audit.getDatabase("empty"))
    // main keeps serving it (empty databases exist on main)
    assert(main.getDatabase("empty").databaseName == "empty")
  }

  private lazy val wfixture: (String, RestCatalog.Server) = {
    val root = Files.createTempDirectory("graft_restbr").toString
    val s = spark
    import s.implicits._
    Catalog.init(root)
    Catalog.createDatabase(root, "wh")
    IcebergLite.append(spark, Catalog.createTable(root, "wh", "t"),
      Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    (root, RestCatalog.serve(root))
  }

  test("branch write surface: fork, branch commit, fast-forward merge to main") {
    val (root, server) = wfixture
    val s = spark
    import s.implicits._
    val path = Catalog.tablePath(root, "wh", "t")
    val wap = new RestCatalog.Client(server.baseUrl, branchId = "wap")
    assert(wap.createBranch() == Seq("wh.t"))
    // duplicate fork and missing parent are definitive answers
    intercept[RestCatalog.ConflictException](wap.createBranch())
    intercept[RestCatalog.TableNotFound](
      new RestCatalog.Client(server.baseUrl, branchId = "x").createBranch("nope"))
    // land data files on storage against the BRANCH (data plane),
    // then merge publishes to main in one pointer flip per table
    IcebergLite.append(spark, path, Seq((3L, "c")).toDF("id", "v"),
      toBranch = Some("wap"))
    assert(new RestCatalog.Client(server.baseUrl).readTable(spark, "wh", "t")
      .count() == 2, "pre-merge main must not see branch commits")
    assert(wap.mergeBranch() == Seq("wh.t"))
    assert(new RestCatalog.Client(server.baseUrl).readTable(spark, "wh", "t")
      .count() == 3)
    assert(wap.deleteBranch() == 1)
    assert(!IcebergLite.branches(path).contains("wap"))
  }

  test("branch write surface: CAS commit and merge conflicts answer 409") {
    val (root, server) = wfixture
    val s = spark
    import s.implicits._
    val path = Catalog.tablePath(root, "wh", "t")
    val dev = new RestCatalog.Client(server.baseUrl, branchId = "dev")
    dev.createBranch()
    val h0 = IcebergLite.branches(path)("dev")
    // two main appends create candidate snapshots; two writers race
    // the SAME expected head — the second is told the truth, not retried
    val s2 = IcebergLite.append(spark, path, Seq((10L, "x")).toDF("id", "v"))
    val s3 = IcebergLite.append(spark, path, Seq((11L, "y")).toDF("id", "v"))
    assert(dev.commitTable("wh", "t", s2, expectedHead = Some(h0)) == s2)
    val cas = intercept[RestCatalog.ConflictException](
      dev.commitTable("wh", "t", s3, expectedHead = Some(h0)))
    assert(cas.getMessage.contains("concurrent change"))
    // merge conflict: branch and main have DIVERGED (dev head s2 is
    // not a descendant chain containing main's s3)
    val mc = intercept[RestCatalog.ConflictException](dev.mergeBranch())
    assert(mc.getMessage.contains("diverged"))
    dev.deleteBranch()
  }

  test("CAS commit is atomic under the concurrent executor: one winner per head") {
    val (root, server) = wfixture
    val s = spark
    import s.implicits._
    val path = Catalog.tablePath(root, "wh", "t")
    val race = new RestCatalog.Client(server.baseUrl, branchId = "race")
    race.createBranch()
    val h0 = IcebergLite.branches(path)("race")
    // land 4 candidate snapshots, then 4 writers race the SAME
    // expected head over the server's thread pool: the read-compare-
    // advance critical section must admit exactly one (the pre-lock
    // server let every racer pass the check and silently kept the
    // last write)
    val snaps = (1 to 4).map(i =>
      IcebergLite.append(spark, path, Seq((100L + i, "r")).toDF("id", "v")))
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    val results = snaps.map { sn =>
      pool.submit(new java.util.concurrent.Callable[Either[String, Long]] {
        def call(): Either[String, Long] =
          try Right(race.commitTable("wh", "t", sn, expectedHead = Some(h0)))
          catch { case e: RestCatalog.ConflictException => Left(e.getMessage) }
      })
    }.map(_.get())
    pool.shutdown()
    assert(results.count(_.isRight) == 1, s"exactly one CAS winner: $results")
    assert(results.count(_.isLeft) == 3)
    val winner = results.collectFirst { case Right(h) => h }.get
    assert(IcebergLite.branches(path)("race") == winner)
    race.deleteBranch()
  }

  test("views surface over REST as VIRTUAL_VIEW with the original text") {
    val (root, server, client) = fixture
    val s = spark
    Catalog.createView(root, "sales", "big_orders", Catalog.ViewDoc(
      "SELECT id, v FROM orders WHERE id > 1", "restcat", Nil, None, Map.empty,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.StringType))).json))
    val listed = client.listTables("sales")
    assert(listed.map(t => (t.tableName, t.tableType)).contains(
      ("big_orders", "VIRTUAL_VIEW")))
    val meta = client.getTable("sales", "big_orders")
    assert(meta.tableType == "VIRTUAL_VIEW")
    assert(meta.tableLocation.isEmpty && meta.tableFormat.isEmpty)
    assert(meta.viewOriginalText.exists(_.contains("FROM orders")))
    assert(meta.columns.map(_.name) == Seq("id", "v"))
    // the metastore serves names and text, never data: reading a view
    // through the storage path is a definitive refusal
    val e = intercept[IllegalArgumentException](
      client.readTable(s, "sales", "big_orders"))
    assert(e.getMessage.contains("VIRTUAL_VIEW"))
    Catalog.dropView(root, "sales", "big_orders")
  }

  test("create-branch refuses a same-named TAG with no partial fork") {
    val (root, server) = wfixture
    val s = spark
    import s.implicits._
    val pt = Catalog.tablePath(root, "wh", "t")
    val pu = Catalog.createTable(root, "wh", "u")
    IcebergLite.append(spark, pu, Seq((1L, 1.0)).toDF("id", "w"))
    // a TAG named 'rel' on the second table clashes with a branch fork
    // of the same name: the route must refuse BEFORE forking anything
    // (the unchecked path forked wh.t, then blew up on wh.u — a
    // partial branch plus a retried 409 blaming the caller)
    IcebergLite.createTag(pu, "rel")
    val rel = new RestCatalog.Client(server.baseUrl, branchId = "rel")
    val e = intercept[RestCatalog.ConflictException](rel.createBranch())
    assert(e.getMessage.contains("already exists"))
    assert(!IcebergLite.branches(pt).contains("rel"),
      "no table may carry the refused branch")
    assert(!IcebergLite.branches(pu).contains("rel"))
    IcebergLite.dropTag(pu, "rel")
  }

  test("malformed commit numbers answer 400; the client treats 400 as permanent") {
    val (_, server) = wfixture
    import java.net.http.{HttpClient, HttpRequest, HttpResponse}
    val http = HttpClient.newHttpClient()
    def post(url: String): HttpResponse[String] = http.send(
      HttpRequest.newBuilder(java.net.URI.create(url))
        .POST(HttpRequest.BodyPublishers.noBody()).build(),
      HttpResponse.BodyHandlers.ofString())
    val base = s"${server.baseUrl}/branch/main/table/wh/t/commit"
    // a malformed number is the CLIENT's error: 400 with the reason,
    // never a NumberFormatException-turned-500 the client retries
    val bad = post(s"$base?snapshot=abc")
    assert(bad.statusCode() == 400, s"${bad.statusCode()} ${bad.body()}")
    assert(bad.body().contains("must be a number"))
    assert(post(base).statusCode() == 400) // missing entirely
    val badHead = post(s"$base?snapshot=1&expected_head=xyz")
    assert(badHead.statusCode() == 400 && badHead.body().contains("expected_head"))
    // client side of the contract: 400 is PERMANENT — it must surface
    // immediately, never enter the 5xx/transport backoff loop (a stub
    // that always answers 400, with a backoff long enough that even
    // one retry sleep would trip the timing assert)
    val stub = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    stub.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) => {
      val b = """{"error": "bad request"}""".getBytes("UTF-8")
      ex.sendResponseHeaders(400, b.length)
      ex.getResponseBody.write(b); ex.close()
    })
    stub.start()
    try {
      val c = new RestCatalog.Client(
        s"http://127.0.0.1:${stub.getAddress.getPort}",
        maxRetries = 3, retryDelayMs = 2000)
      val t0 = System.nanoTime()
      val e = intercept[RuntimeException](c.listDatabases())
      val elapsedMs = (System.nanoTime() - t0) / 1e6
      assert(e.getMessage.contains("HTTP 400"), e.getMessage)
      assert(!e.getMessage.contains("max retries"))
      assert(elapsedMs < 2000, s"400 must not back off (took ${elapsedMs}ms)")
    } finally stub.stop(0)
  }
}
