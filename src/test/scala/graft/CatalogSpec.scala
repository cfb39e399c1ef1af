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
