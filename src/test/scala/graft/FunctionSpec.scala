package graft

import org.scalatest.funsuite.AnyFunSuite

/** Known-vector validation for the Trino-compat layer — the analogue of
  * the reference's function_validation_tests.rs (225 tests): each custom
  * expression pinned against published test vectors or closed-form
  * values, via spark.sql so name dispatch is covered too. */
class FunctionSpec extends AnyFunSuite {
  import TestSpark._

  private def one[T](sql: String): T = {
    Engine.registerDir(spark, sf0001)
    spark.sql(s"SELECT $sql AS v").collect()(0).getAs[T]("v")
  }
  private def approx(sql: String, expected: Double, tol: Double = 1e-9): Unit = {
    val got = one[Double](sql)
    assert(math.abs(got - expected) <= tol, s"$sql = $got, expected $expected")
  }

  // --- encodings (RFC 4648 test vectors) -----------------------------
  test("base32 RFC 4648 vectors") {
    assert(one[String]("to_base32('foobar')") == "MZXW6YTBOI======")
    assert(one[String]("to_base32('f')") == "MY======")
    assert(one[String]("CAST(from_base32('MZXW6YTBOI======') AS STRING)") == "foobar")
  }
  test("base64url roundtrip + alphabet") {
    assert(one[String]("to_base64url('~~??>>')") == java.util.Base64.getUrlEncoder
      .encodeToString("~~??>>".getBytes))
    assert(one[String]("CAST(from_base64url(to_base64url('hello world')) AS STRING)") == "hello world")
  }
  test("big endian + ieee754") {
    assert(one[Long]("from_big_endian_64(to_big_endian_64(123456789012345))") == 123456789012345L)
    assert(one[Int]("from_big_endian_32(to_big_endian_32(-42))") == -42)
    assert(one[Double]("from_ieee754_64(to_ieee754_64(3.14159))") == 3.14159)
    assert(one[String]("hex(to_ieee754_32(1.0))") == "3F800000")
  }

  // --- hmac (RFC 4231 test case 2: key="Jefe", data="what do ya want for nothing?")
  test("hmac_sha256 RFC 4231 vector") {
    assert(one[String]("hmac_sha256('what do ya want for nothing?', 'Jefe')") ==
      "5bdcc146bf60754e6a042426089575c75a003f089d2739839dec58b964ec3843")
  }
  test("hmac_md5 RFC 2202 vector") {
    assert(one[String]("hmac_md5('what do ya want for nothing?', 'Jefe')") ==
      "750c783e6ab0b503eaa86e310a5db738")
  }

  // --- stemming (Porter's published examples) ------------------------
  test("word_stem Porter vectors") {
    val cases = Map(
      "caresses" -> "caress", "ponies" -> "poni", "caress" -> "caress",
      "cats" -> "cat", "plastered" -> "plaster", "motoring" -> "motor",
      "conflated" -> "conflat", "troubling" -> "troubl",
      "happy" -> "happi", "relational" -> "relat", "adjustable" -> "adjust")
    cases.foreach { case (in, out) =>
      assert(one[String](s"word_stem('$in')") == out, s"stem($in)")
    }
  }

  // --- normalize -----------------------------------------------------
  test("normalize NFC composes") {
    // e + combining acute accent -> é
    assert(one[String]("normalize('é', 'NFC')") == "é")
    assert(one[String]("normalize('é', 'NFD')") == "é")
  }

  // --- distances -----------------------------------------------------
  test("hamming_distance") {
    assert(one[Long]("hamming_distance('karolin', 'kathrin')") == 3L)
    assert(one[Long]("hamming_distance('abc', 'abc')") == 0L)
  }

  // --- numeric helpers ----------------------------------------------
  test("truncate rounds toward zero") {
    approx("truncate(3.789, 2)", 3.78)
    approx("truncate(-3.789, 2)", -3.78)
    approx("truncate(3.789)", 3.0)
    approx("truncate(-3.789)", -3.0)
  }
  test("is_finite / is_infinite") {
    assert(one[Boolean]("is_finite(1.0)"))
    assert(!one[Boolean]("is_finite(CAST('Infinity' AS DOUBLE))"))
    assert(one[Boolean]("is_infinite(CAST('Infinity' AS DOUBLE))"))
    assert(!one[Boolean]("is_infinite(nan())"))
  }
  test("human_readable_seconds") {
    assert(one[String]("human_readable_seconds(96)") == "1 minute, 36 seconds")
    assert(one[String]("human_readable_seconds(3762)") == "1 hour, 2 minutes, 42 seconds")
    assert(one[String]("human_readable_seconds(0)") == "0 seconds")
  }
  test("parse_data_size") {
    assert(one[Long]("parse_data_size('2.3MB')") == math.round(2.3 * (1 << 20)))
    assert(one[Long]("parse_data_size('7kB')") == 7 * 1024L)
    assert(one[Long]("parse_data_size('9B')") == 9L)
  }
  test("to_base / from_base") {
    assert(one[String]("to_base(255, 16)") == "ff")
    assert(one[Long]("from_base('ff', 16)") == 255L)
    assert(one[String]("to_base(10, 2)") == "1010")
  }

  // --- statistical CDFs (closed-form / scipy-checked values) ---------
  test("normal_cdf") {
    approx("normal_cdf(0, 1, 0)", 0.5)
    approx("normal_cdf(0, 1, 1.959963984540054)", 0.975, 1e-12)
    approx("normal_cdf(10, 2, 10)", 0.5)
  }
  test("inverse_normal_cdf") {
    approx("inverse_normal_cdf(0, 1, 0.975)", 1.959963984540054, 1e-9)
    approx("inverse_normal_cdf(5, 3, 0.5)", 5.0)
  }
  test("beta_cdf") {
    approx("beta_cdf(1, 1, 0.3)", 0.3, 1e-12) // uniform
    approx("beta_cdf(2, 2, 0.5)", 0.5, 1e-12) // symmetric
  }
  test("t_cdf / t_pdf") {
    // reference argument order: T_CDF(x, df) — filter.rs:3194
    approx("t_cdf(0, 10)", 0.5, 1e-12)
    // t(1) = Cauchy: F(1) = 3/4
    approx("t_cdf(1, 1)", 0.75, 1e-9)
  }
  test("wilson intervals bracket the point estimate") {
    val lo = one[Double]("wilson_interval_lower(80, 100, 1.96)")
    val hi = one[Double]("wilson_interval_upper(80, 100, 1.96)")
    assert(lo < 0.8 && 0.8 < hi && lo > 0.7 && hi < 0.9)
  }

  // --- datetime dialect ---------------------------------------------
  test("year_of_week ISO semantics") {
    assert(one[Int]("year_of_week(TIMESTAMP '2021-01-01 00:00:00')") == 2020)
    assert(one[Int]("year_of_week(TIMESTAMP '2021-01-04 00:00:00')") == 2021)
  }
  test("mysql date_format / date_parse") {
    assert(one[String]("mysql_date_format(TIMESTAMP '2024-03-15 14:30:45', '%Y-%m-%d %H:%i:%S')") ==
      "2024-03-15 14:30:45")
    assert(one[String]("mysql_date_format(TIMESTAMP '2024-03-15 14:30:45', '%d/%m/%y')") == "15/03/24")
    assert(one[java.time.LocalDateTime]("date_parse('2024-03-15', '%Y-%m-%d')") ==
      java.time.LocalDateTime.of(2024, 3, 15, 0, 0, 0))
  }
  test("Trino quoted datetime units parse via dialect shim") {
    Engine.registerDir(spark, sf0001)
    val r = spark.sql("SELECT date_add('day', 3, TIMESTAMP '2024-01-30 00:00:00') AS v").collect()(0)
    assert(r.getAs[java.time.LocalDateTime]("v") == java.time.LocalDateTime.of(2024, 2, 2, 0, 0))
    val d = spark.sql("SELECT date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-01-02 03:00:00') AS v")
      .collect()(0).getAs[Long]("v")
    assert(d == 27L)
  }

  // --- json ----------------------------------------------------------
  test("json_array_get / contains / is_json_scalar / json_size") {
    assert(one[String]("json_array_get('[1,2,3]', 1)") == "2")
    assert(one[String]("json_array_get('[1,2,3]', -1)") == "3")
    assert(one[String]("json_array_get('[\"a\",\"b\"]', 0)") == "a")
    assert(one[Any]("json_array_get('[1]', 5)") == null)
    assert(one[Boolean]("json_array_contains('[1,2,3]', 2)"))
    assert(!one[Boolean]("json_array_contains('[1,2,3]', 9)"))
    assert(one[Boolean]("json_array_contains('[\"x\"]', 'x')"))
    assert(one[Boolean]("is_json_scalar('1')"))
    assert(one[Boolean]("is_json_scalar('\"abc\"')"))
    assert(!one[Boolean]("is_json_scalar('[1,2]')"))
    assert(one[Long]("json_size('{\"a\":1,\"b\":2}')") == 2L)
    assert(one[Long]("json_size('[1,2,3]')") == 3L)
    assert(one[Long]("json_size('7')") == 0L)
  }
  test("json_parse / json_format / json_exists / json_query") {
    assert(one[String]("json_parse('{\"b\": 1, \"a\": 2}')") == "{\"b\":1,\"a\":2}".replace("\\", ""))
    assert(one[String]("json_format('[1, 2,  3]')") == "[1,2,3]")
    assert(one[Boolean]("json_exists('{\"a\":{\"b\":1}}', '$.a.b')"))
    assert(!one[Boolean]("json_exists('{\"a\":1}', '$.zzz')"))
    assert(one[String]("json_value('{\"a\":{\"b\":7}}', '$.a.b')") == "7")
    intercept[Exception] { one[String]("json_parse('{bad json')") }
  }
  test("format maps to format_string") {
    assert(one[String]("format('%s-%d', 'x', 7)") == "x-7")
  }

  // --- cosine --------------------------------------------------------
  test("cosine_similarity known vectors") {
    approx("cosine_similarity(array(1.0D, 0.0D), array(0.0D, 1.0D))", 0.0)
    approx("cosine_similarity(array(1.0D, 2.0D, 3.0D), array(1.0D, 2.0D, 3.0D))", 1.0, 1e-12)
    approx("cosine_similarity(array(1.0D, 0.0D), array(-1.0D, 0.0D))", -1.0)
    assert(one[Any]("cosine_similarity(array(0.0D, 0.0D), array(1.0D, 1.0D))") == null)
  }

  // --- aggregates ----------------------------------------------------
  test("geometric_mean") {
    approx("(SELECT geometric_mean(x) FROM VALUES (2.0), (8.0) AS t(x))", 4.0, 1e-12)
    approx("(SELECT geometric_mean(x) FROM VALUES (1.0), (1000.0) AS t(x))",
      math.sqrt(1000.0), 1e-9)
    // non-positive values are excluded from both the log-sum AND the
    // count (reference hash_agg.rs:2178-2181): mean of {2, 8} only
    approx("(SELECT geometric_mean(x) FROM VALUES (2.0), (0.0), (-5.0), (8.0) AS t(x))",
      4.0, 1e-12)
    // NULLs likewise
    approx("(SELECT geometric_mean(x) FROM VALUES (2.0), (CAST(NULL AS DOUBLE)), (8.0) AS t(x))",
      4.0, 1e-12)
  }
  test("checksum matches reference XOR-of-raw for integers") {
    // reference hash_agg.rs:2184-2193: CHECKSUM(int) = XOR of raw values
    assert(one[Long]("(SELECT checksum(x) FROM VALUES (1), (2), (4) AS t(x))") == (1L ^ 2L ^ 4L))
    assert(one[Long]("(SELECT checksum(x) FROM VALUES (5), (CAST(NULL AS INT)) AS t(x))") == 5L)
  }
  test("checksum is order-independent and content-sensitive") {
    val a = one[Long]("(SELECT checksum(x) FROM VALUES (1), (2), (3) AS t(x))")
    val b = one[Long]("(SELECT checksum(x) FROM VALUES (3), (1), (2) AS t(x))")
    val c = one[Long]("(SELECT checksum(x) FROM VALUES (1), (2), (4) AS t(x))")
    assert(a == b)
    assert(a != c)
  }

  test("approx_percentile: exact nearest-rank default + documented sketch opt-out") {
    // default (exact, reference nearest-rank parity): idx = round((4-1)*0.5)+1
    // over sorted [1,2,3,100] -> element 3 (rank math, no interpolation)
    val q = "(SELECT CAST(approx_percentile(x, 0.5) AS DOUBLE) " +
      "FROM VALUES (1.0), (100.0), (2.0), (3.0) AS t(x))"
    assert(one[Double](q) == 3.0)
    // SCALE.md opt-out: bounded-state sketch for fat groups. The sketch
    // may pick the other side of the median rank (its rank convention
    // differs from nearest-rank), so assert it lands on an actual input
    // value adjacent to the true median rather than bit-exact parity.
    spark.conf.set("spark.graft.approxPercentile.exact", "false")
    try assert(Set(2.0, 3.0).contains(one[Double](q)))
    finally spark.conf.unset("spark.graft.approxPercentile.exact")
  }
}
