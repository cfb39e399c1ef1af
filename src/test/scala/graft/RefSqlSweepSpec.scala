package graft

import org.scalatest.funsuite.AnyFunSuite

/** Sweeps the reference's other two SQL test surfaces (beyond the
  * golden manifest covered by RefParitySpec):
  *
  *  - `tests/sql_comprehensive.rs` — 128 end-to-end tests over tiny
  *    in-memory fixtures (users/orders/products/empty_table/numbers,
  *    built at sql_comprehensive.rs:17-160);
  *  - `tests/function_validation_tests.rs` — ~400 `SELECT fn(...)`
  *    probes over a 5-row test_data fixture
  *    (function_validation_tests.rs:17-70).
  *
  * The SQL strings are extracted from the reference checkout AT
  * RUNTIME (string-literal regex; nothing is vendored) and each is
  * executed through `spark.sql` on the same fixtures, recreated here
  * row-for-row. This proves every reference test query parses, binds
  * and executes on this engine; expected VALUES are pinned by our own
  * FunctionValuesSpec / oracle catalog instead (the reference asserts
  * them in Rust code, which is not reliably machine-extractable).
  *
  * Queries the reference itself expects to error (negative tests,
  * e.g. `FROM nonexistent`) are detected by referencing a table
  * outside the fixture set and asserted to fail here too.
  */
class RefSqlSweepSpec extends AnyFunSuite {

  private val refTests = "/root/reference/tests"

  private sealed trait Expect
  private case object MustPass extends Expect
  private case object MustFail extends Expect
  private case object Either extends Expect

  /** (sql, expectation) pairs. Rust string literals are unescaped. A
    * query expects failure when its enclosing `fn` body asserts
    * `is_err()` (the reference's negative tests), and either outcome
    * when the body discards the result (`let _ = result` — the
    * reference's "might error or do implicit conversion" tests). */
  private def extractSelects(path: String): Seq[(String, Expect)] = {
    // function_validation_tests.rs contains stray non-UTF-8 bytes in
    // comments; ISO-8859-1 decodes any byte sequence (the SQL is ASCII)
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.ISO8859)
    val text = try src.mkString finally src.close()
    text.split("""\bfn """).toSeq.flatMap { block =>
      val negative: Expect =
        if (block.contains("is_err")) MustFail
        else if (block.contains("let _ = result")) Either
        else MustPass
      // plain "..." literals, honoring \" and \\ escapes
      val plain = """"((?:[^"\\]|\\.)*)"""".r.findAllMatchIn(block).map(_.group(1))
        .filter(_.startsWith("SELECT "))
        .map(_.replace("\\\"", "\"").replace("\\\\", "\\").replace("\\n", "\n"))
      // r#"..."# raw literals, possibly multi-line
      val raw = """(?s)r#"\s*(SELECT .*?)"#""".r.findAllMatchIn(block).map(_.group(1))
      (plain ++ raw).map(_ -> negative)
    }.distinct
  }

  private val fixtureTables =
    Set("users", "orders", "products", "empty_table", "numbers", "test_data")

  /** Tables a query references that are outside the fixture set (the
    * reference's negative tests reference e.g. `nonexistent`). */
  private def unknownTables(sql: String): Set[String] =
    """(?i)\b(?:FROM|JOIN)\s+([a-z_][a-z_0-9]*)""".r
      .findAllMatchIn(sql).map(_.group(1).toLowerCase).toSet -- fixtureTables --
      Set("select") // FROM (SELECT ...) subqueries

  private def registerFixtures(): Unit = {
    val spark = TestSpark.spark
    import spark.implicits._
    // users (sql_comprehensive.rs:21-65)
    Seq[(Long, Option[String], Option[Long], Option[Double], Option[Boolean])](
      (1L, Some("Alice"), Some(30L), Some(50000.0), Some(true)),
      (2L, Some("Bob"), Some(25L), Some(60000.0), Some(true)),
      (3L, Some("Charlie"), Some(35L), Some(75000.0), Some(false)),
      (4L, Some("Diana"), Some(28L), Some(55000.0), Some(true)),
      (5L, None, Some(40L), Some(80000.0), Some(false)))
      .toDF("id", "name", "age", "salary", "active").createOrReplaceTempView("users")
    // orders (sql_comprehensive.rs:67-95)
    Seq[(Long, Long, Double, Option[String])](
      (101L, 1L, 100.0, Some("completed")), (102L, 1L, 200.0, Some("pending")),
      (103L, 2L, 150.0, Some("completed")), (104L, 3L, 300.0, Some("cancelled")),
      (105L, 4L, 250.0, Some("completed")), (106L, 1L, 175.0, Some("completed")))
      .toDF("order_id", "user_id", "amount", "status").createOrReplaceTempView("orders")
    // products (sql_comprehensive.rs:97-128)
    Seq[(Long, String, Double, Option[String])](
      (1L, "Widget", 10.0, Some("A")), (2L, "Gadget", 25.0, Some("B")),
      (3L, "Gizmo", 15.0, Some("A")), (4L, "Doohickey", 30.0, Some("B")),
      (5L, "Thingamabob", 20.0, Some("C")))
      .toDF("product_id", "name", "price", "category").createOrReplaceTempView("products")
    // empty_table (sql_comprehensive.rs:130-145)
    Seq.empty[(Long, Long)].toDF("id", "value").createOrReplaceTempView("empty_table")
    // numbers (sql_comprehensive.rs:147-156)
    (1L to 10L).toDF("n").createOrReplaceTempView("numbers")
    // test_data (function_validation_tests.rs:17-70)
    Seq[(Long, Option[Long], Option[Double], Option[String], Option[Boolean])](
      (1L, Some(10L), Some(1.5), Some("hello"), Some(true)),
      (2L, Some(20L), Some(2.5), Some("world"), Some(false)),
      (3L, Some(30L), Some(3.5), Some("test"), Some(true)),
      (4L, Some(40L), Some(4.5), Some("foo"), Some(false)),
      (5L, Some(50L), Some(5.5), Some("bar"), Some(true)))
      .toDF("id", "val_int", "val_float", "val_str", "val_bool")
      .createOrReplaceTempView("test_data")
  }

  private def sweep(file: String): Unit = {
    assume(new java.io.File(s"$refTests/$file").exists(), "reference checkout not mounted")
    val spark = TestSpark.spark
    Engine.registerDir(spark, TestSpark.sf0001) // function registry + dialect
    registerFixtures()
    val sqls = extractSelects(s"$refTests/$file")
    assert(sqls.nonEmpty)
    try runAll(sqls, file)
    finally {
      // `orders` shadows the TPC-H parquet view of the same name —
      // restore it and drop the rest for the suites sharing the session
      sources.ParquetTables.read(spark, s"${TestSpark.sf0001}/orders.parquet")
        .createOrReplaceTempView("orders")
      Seq("users", "products", "empty_table", "numbers", "test_data")
        .foreach(spark.catalog.dropTempView(_))
    }
  }

  private def runAll(sqls: Seq[(String, Expect)], file: String): Unit = {
    val spark = TestSpark.spark
    val failures = sqls.flatMap { case (sql, expect0) =>
      val expect = if (unknownTables(sql).nonEmpty) MustFail else expect0
      try {
        spark.sql(sql).collect()
        if (expect == MustFail)
          Some(sql.take(80) -> "expected an error (negative test) but succeeded")
        else None
      } catch {
        case e: Throwable =>
          if (expect != MustPass) None
          else Some(sql.take(120) ->
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    assert(failures.isEmpty,
      s"${failures.size}/${sqls.size} failed in $file:\n" +
        failures.map { case (q, m) => s"  $q\n    -> $m" }.mkString("\n"))
  }

  test("all sql_comprehensive.rs queries execute") { sweep("sql_comprehensive.rs") }
  test("all function_validation_tests.rs probes execute") {
    sweep("function_validation_tests.rs")
  }
}
