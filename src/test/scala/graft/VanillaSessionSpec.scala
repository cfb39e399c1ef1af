package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The driver may invoke SparkEntry with its own plain SparkSession
  * (no GraftExtensions, no Engine.session defaults). Everything the
  * contract exposes must work there: registerDir does the runtime
  * setup (nanos conf, timestampType, function registry); only the
  * quoted-datetime-unit dialect needs the builder-time parser. */
class VanillaSessionSpec extends AnyFunSuite {

  private lazy val vanilla: SparkSession = {
    // a separate, extension-free session in the same JVM
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("vanilla")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
      .newSession()
    s
  }

  test("entry works on a vanilla session") {
    assert(SparkEntry.entry(vanilla).count() > 0)
  }

  test("representative catalog queries work on a vanilla session") {
    val dir = TestSpark.sf0001
    Seq("tpch_q01", "tpch_q21", "trino_datetime", "func_json",
        "dedup_minhash_lsh", "llm_pipeline", "agg_percentile").foreach { name =>
      val n = SparkEntry.queries(name)(vanilla, dir).count()
      assert(n >= 0, name)
    }
  }

  test("custom function registry is available after registerDir") {
    Engine.registerDir(vanilla, TestSpark.sf0001)
    val r = vanilla.sql("SELECT word_stem('running') AS v").collect()(0).getString(0)
    assert(r == "run")
  }
}
