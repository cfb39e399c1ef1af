package graft

import org.scalatest.funsuite.AnyFunSuite

/** Every Trino-compat registration must at least resolve and evaluate —
  * the binder-dispatch analogue of the reference's function_tests.rs. */
class RegistrySmokeSpec extends AnyFunSuite {
  import TestSpark._

  private val probes: Seq[(String, String)] = Seq(
    "cosine_similarity" -> "cosine_similarity(array(1.0D,2.0D), array(2.0D,1.0D))",
    "cosine_distance" -> "cosine_distance(array(1.0D,2.0D), array(2.0D,1.0D))",
    "hmac_sha1" -> "hmac_sha1('data', 'key')",
    "hmac_sha512" -> "hmac_sha512('data', 'key')",
    "normalize_1arg" -> "normalize('abc')",
    "word_stem" -> "word_stem('running')",
    "hamming_distance" -> "hamming_distance('ab', 'ac')",
    "to_base32" -> "to_base32('x')",
    "to_base64url" -> "to_base64url('x')",
    "starts_with" -> "starts_with('abc', 'ab')",
    "ends_with" -> "ends_with('abc', 'bc')",
    "sha256" -> "sha256('hello')",
    "to_base64" -> "to_base64('hello')",
    "from_base64" -> "cast(from_base64(to_base64('hi')) as string)",
    "to_big_endian_32" -> "hex(to_big_endian_32(7))",
    "to_ieee754_64" -> "hex(to_ieee754_64(1.5))",
    "is_finite" -> "is_finite(1.0)",
    "is_infinite" -> "is_infinite(1.0)",
    "human_readable_seconds" -> "human_readable_seconds(61)",
    "parse_data_size" -> "parse_data_size('1kB')",
    "truncate" -> "truncate(1.99)",
    "year_of_week" -> "year_of_week(TIMESTAMP '2024-06-01 00:00:00')",
    "yow" -> "yow(TIMESTAMP '2024-06-01 00:00:00')",
    "normal_cdf" -> "normal_cdf(0, 1, 0.5)",
    "inverse_normal_cdf" -> "inverse_normal_cdf(0, 1, 0.7)",
    "beta_cdf" -> "beta_cdf(2, 3, 0.4)",
    "inverse_beta_cdf" -> "inverse_beta_cdf(2, 3, 0.4)",
    "t_cdf" -> "t_cdf(1.0, 5)",
    "t_pdf" -> "t_pdf(1.0, 5)",
    "wilson_lower" -> "wilson_interval_lower(10, 100, 1.96)",
    "wilson_upper" -> "wilson_interval_upper(10, 100, 1.96)",
    "mysql_date_format" -> "mysql_date_format(TIMESTAMP '2024-01-01 00:00:00', '%Y')",
    "date_parse" -> "date_parse('2024-01-01', '%Y-%m-%d')",
    "geometric_mean" -> "(SELECT geometric_mean(x) FROM VALUES (1.0),(2.0) t(x))",
    "checksum" -> "(SELECT checksum(x) FROM VALUES (1),(2) t(x))",
    "strpos" -> "strpos('hello', 'll')",
    "index" -> "index('hello', 'll')",
    "levenshtein_distance" -> "levenshtein_distance('a', 'ab')",
    "codepoint" -> "codepoint('A')",
    "to_utf8" -> "octet_length(to_utf8('abc'))",
    "from_utf8" -> "from_utf8(to_utf8('abc'))",
    "from_hex" -> "from_hex('4142')",
    "to_hex" -> "to_hex(to_utf8('AB'))",
    "from_base" -> "from_base('z', 36)",
    "to_base" -> "to_base(35, 36)",
    "infinity" -> "infinity()",
    "nan_isnan" -> "isnan(nan())",
    "cot" -> "cot(1.0)",
    "day_of_week" -> "day_of_week(TIMESTAMP '2024-01-01 00:00:00')",
    "dow" -> "dow(TIMESTAMP '2024-01-01 00:00:00')",
    "day_of_year" -> "day_of_year(TIMESTAMP '2024-02-01 00:00:00')",
    "doy" -> "doy(TIMESTAMP '2024-02-01 00:00:00')",
    "week" -> "week(TIMESTAMP '2024-02-01 00:00:00')",
    "week_of_year" -> "week_of_year(TIMESTAMP '2024-02-01 00:00:00')",
    "last_day_of_month" -> "last_day_of_month(TIMESTAMP '2024-02-01 00:00:00')",
    "timezone_hour" -> "timezone_hour(TIMESTAMP '2024-02-01 00:00:00')",
    "at_timezone" -> "at_timezone(TIMESTAMP '2024-02-01 12:00:00', 'America/New_York')",
    "to_unixtime" -> "to_unixtime(TIMESTAMP '2024-01-01 00:00:00')",
    "from_iso8601_timestamp" -> "from_iso8601_timestamp('2024-01-01T10:30:00')",
    "from_iso8601_date" -> "from_iso8601_date('2024-01-01')",
    "to_iso8601" -> "to_iso8601(TIMESTAMP '2024-01-01 10:30:00')",
    "url_extract_protocol" -> "url_extract_protocol('https://h/p')",
    "url_extract_host" -> "url_extract_host('https://h/p')",
    "url_extract_path" -> "url_extract_path('https://h/p')",
    "url_extract_query" -> "url_extract_query('https://h/p?a=1')",
    "url_extract_fragment" -> "url_extract_fragment('https://h/p#f')",
    "url_extract_parameter" -> "url_extract_parameter('https://h/p?a=1', 'a')",
    "url_extract_port" -> "url_extract_port('https://h:8080/p')",
    "try" -> "try(1)",
    "regexp_like" -> "regexp_like('abc', 'b')",
    "regexp_split" -> "regexp_split('a1b2c', '[0-9]')",
    "bitwise_and" -> "bitwise_and(12, 10)",
    "bitwise_or" -> "bitwise_or(12, 10)",
    "bitwise_xor" -> "bitwise_xor(12, 10)",
    "bitwise_not" -> "bitwise_not(12)",
    "bitwise_left_shift" -> "bitwise_left_shift(1, 3)",
    "bitwise_right_shift" -> "bitwise_right_shift(8, 3)",
    "bitwise_right_shift_arithmetic" -> "bitwise_right_shift_arithmetic(-8, 1)",
    "is_nan" -> "is_nan(sqrt(-1.0))",
    "json_extract" -> "json_extract('{\"a\": {\"b\": 1}}', '$.a.b')",
    "json_extract_scalar" -> "json_extract_scalar('{\"a\": \"x\"}', '$.a')",
    "json_object" -> "json_object('k', 1)",
    "json_array" -> "json_array(1, 2, 3)",
    "timezone" -> "timezone(now())",
    "sha512" -> "sha512('x')",
    "bitwise_and_agg" -> "(SELECT bitwise_and_agg(x) FROM VALUES (12),(10) t(x))",
    "bitwise_or_agg" -> "(SELECT bitwise_or_agg(x) FROM VALUES (4),(1) t(x))",
    "arbitrary" -> "(SELECT arbitrary(x) FROM VALUES (1) t(x))",
    "approx_distinct" -> "(SELECT approx_distinct(x) FROM VALUES (1),(1),(2) t(x))",
    "approx_percentile" -> "(SELECT approx_percentile(x, 0.5) FROM VALUES (1.0),(2.0),(3.0) t(x))")

  probes.foreach { case (label, sql) =>
    test(s"registered function evaluates: $label") {
      Engine.registerDir(spark, sf0001)
      val rows = spark.sql(s"SELECT ${sql} AS v").collect()
      assert(rows.length == 1)
    }
  }

  test("spot values for alias mappings") {
    Engine.registerDir(spark, sf0001)
    def v[T](sql: String): T = spark.sql(s"SELECT $sql AS v").collect()(0).getAs[T]("v")
    assert(v[Int]("strpos('hello', 'll')") == 3)
    assert(v[Int]("codepoint('A')") == 65)
    assert(v[Long]("from_base('z', 36)") == 35L)
    assert(v[String]("to_base(35, 36)") == "z")
    assert(v[Long]("(SELECT approx_distinct(x) FROM VALUES (1),(1),(2) t(x))") == 2L)
    assert(v[Int]("day_of_week(TIMESTAMP '2024-01-01 00:00:00')") == 1) // Monday
    assert(v[String]("url_extract_host('https://example.com:8080/p?q=1')") == "example.com")
    assert(v[Int]("url_extract_port('https://example.com:8080/p')") == 8080)
    // nearest-rank: returns an actual element (in the input's own type,
    // hence the cast); [1,2] at p=0.5 → idx round(0.5)=1 → 2, not 1.5
    assert(v[Double]("(SELECT CAST(approx_percentile(x, 0.5) AS DOUBLE) FROM VALUES (1.0),(2.0),(3.0) t(x))") == 2.0)
    assert(v[Double]("(SELECT CAST(approx_percentile(x, 0.5) AS DOUBLE) FROM VALUES (1.0),(2.0) t(x))") == 2.0)
    // WITH_TIMEZONE declares the instant: noon in New York = 17:00 UTC (Feb = EST)
    assert(v[java.time.LocalDateTime]("with_timezone(TIMESTAMP '2024-02-01 12:00:00', 'America/New_York')") ==
      java.time.LocalDateTime.of(2024, 2, 1, 17, 0))
    // AT_TIMEZONE preserves the instant (session UTC) and re-displays it
    assert(v[java.time.LocalDateTime]("at_timezone(TIMESTAMP '2024-02-01 12:00:00', 'America/New_York')") ==
      java.time.LocalDateTime.of(2024, 2, 1, 7, 0))
  }
}
