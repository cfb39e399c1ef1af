package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-differ contract, machine-enforced (VERDICT r15 #2): any
  * oracle-carrying catalog row must expose scalar top-level columns
  * only — the driver's pandas row sort crashes on arrays/structs/maps
  * (`TypeError: unhashable type: 'numpy.ndarray'`, the r15 red rows).
  * [[Verify.assertScalarColumns]] makes the refusal loud at dump time;
  * these specs pin the guard itself and sweep the live catalog's
  * STATIC schemas so the r15 divergence is unreproducible. */
class DifferContractSpec extends AnyFunSuite {
  import TestSpark._

  test("array-columned result is refused loudly") {
    import spark.implicits._
    val df = Seq((1L, Seq(0.1, 0.2))).toDF("cell_id", "centroid")
    val e = intercept[IllegalArgumentException] {
      Verify.assertScalarColumns("bad_row", df.schema)
    }
    assert(e.getMessage.contains("differ contract violation"))
    assert(e.getMessage.contains("centroid"))
    assert(e.getMessage.contains("posexplode"))
  }

  test("struct and map columns are refused; scalars pass") {
    import spark.implicits._
    val st = Seq((1, (2, 3))).toDF("id", "pair")
    assert(intercept[IllegalArgumentException] {
      Verify.assertScalarColumns("bad_struct", st.schema)
    }.getMessage.contains("pair"))
    val mp = Seq((1, Map("a" -> 2))).toDF("id", "m")
    assert(intercept[IllegalArgumentException] {
      Verify.assertScalarColumns("bad_map", mp.schema)
    }.getMessage.contains("m: MAP"))
    val ok = Seq((1L, "x", 0.5)).toDF("id", "s", "d")
    Verify.assertScalarColumns("good_row", ok.schema) // no throw
  }

  test("every oracle-carrying catalog row passes the scalar-schema guard") {
    // Schema-only sweep: fn(spark, sf0.001) builds each plan (cheap for
    // most rows; fit-backed TVFs run their bounded fits once — the same
    // work Verify does), then the guard checks the STATIC schema without
    // executing the query. This is the catalog-wide regression net: a
    // future row that ships an array column fails HERE, not in the
    // driver's differ.
    val failures = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => SparkEntry.oracleSql.contains(name) }
      .flatMap { case (name, fn) =>
        try {
          Verify.assertScalarColumns(name, fn(spark, sf0001).schema)
          None
        } catch {
          case e: IllegalArgumentException => Some(s"$name: ${e.getMessage}")
          case e: Throwable => Some(s"$name: plan build failed: ${e.getMessage}")
        }
      }
    assert(failures.isEmpty, failures.mkString("\n"))
  }
}
