package graft

import org.scalatest.funsuite.AnyFunSuite

/** Table-driven literal-value validation across the whole Trino-style
  * surface — the direct analogue of the reference's
  * function_validation_tests.rs (`SELECT fn(...)` → expected scalar).
  * One test per category; each row is (expression, expected repr). */
class FunctionValuesSpec extends AnyFunSuite {
  import TestSpark._

  private def check(cases: Seq[(String, String)]): Unit = {
    Engine.registerDir(spark, sf0001)
    cases.foreach { case (sql, expected) =>
      val got = spark.sql(s"SELECT $sql AS v").collect()(0).get(0)
      val gotRepr = if (got == null) "null" else got.toString
      assert(gotRepr == expected, s"$sql => $gotRepr, want $expected")
    }
  }

  test("string function values") {
    check(Seq(
      "upper('aBc')" -> "ABC",
      "lower('aBc')" -> "abc",
      "trim('  x  ')" -> "x",
      "ltrim('  x')" -> "x",
      "rtrim('x  ')" -> "x",
      "length('héllo')" -> "5",
      "substring('hello', 2, 3)" -> "ell",
      "concat('a', 'b', 'c')" -> "abc",
      "concat_ws('-', 'a', 'b')" -> "a-b",
      "replace('banana', 'na', 'xy')" -> "baxyxy",
      "reverse('abc')" -> "cba",
      "lpad('7', 3, '0')" -> "007",
      "rpad('7', 3, '0')" -> "700",
      "split_part('a,b,c', ',', 2)" -> "b",
      "startswith('hello', 'he')" -> "true",
      "endswith('hello', 'lo')" -> "true",
      "char(65)" -> "A",
      "ascii('A')" -> "65",
      "left('hello', 2)" -> "he",
      "right('hello', 2)" -> "lo",
      "repeat('ab', 3)" -> "ababab",
      "translate('abc', 'ab', 'xy')" -> "xyc",
      "levenshtein('kitten', 'sitting')" -> "3",
      "soundex('Robert')" -> "R163",
      "luhn_check('79927398713')" -> "true",
      "luhn_check('79927398710')" -> "false",
      "instr('hello', 'l')" -> "3",
      "locate('l', 'hello')" -> "3",
      "initcap('hello world')" -> "Hello World",
      "format_string('%s=%d', 'x', 5)" -> "x=5",
      "format_number(1234567.891, 2)" -> "1,234,567.89"))
  }

  test("math function values") {
    check(Seq(
      "abs(-5)" -> "5",
      "ceil(2.1)" -> "3",
      "floor(2.9)" -> "2",
      "round(2.456, 2)" -> "2.46",
      "power(2, 10)" -> "1024.0",
      "sqrt(144)" -> "12.0",
      "cbrt(27)" -> "3.0",
      "mod(10, 3)" -> "1",
      "sign(-2.5)" -> "-1.0",
      "ln(exp(1))" -> "1.0",
      "log10(1000)" -> "3.0",
      "log2(8)" -> "3.0",
      "log(2, 8)" -> "3.0",
      "exp(0)" -> "1.0",
      "pi()" -> "3.141592653589793",
      "e()" -> "2.718281828459045",
      "degrees(pi())" -> "180.0",
      "radians(180) = pi()" -> "true",
      "atan2(1, 1) = pi() / 4" -> "true",
      "width_bucket(25, 0, 50, 10)" -> "6",
      "greatest(1, 9, 5)" -> "9",
      "least(1, 9, 5)" -> "1",
      "conv('ff', 16, 10)" -> "255",
      "factorial(5)" -> "120",
      "pmod(-3, 5)" -> "2",
      "truncate(9.99)" -> "9.0",
      "bround(2.5)" -> "2", // banker's rounding
      "round(2.5)" -> "3"))
  }

  test("datetime function values") {
    check(Seq(
      "year(TIMESTAMP '2024-03-15 10:30:45')" -> "2024",
      "month(TIMESTAMP '2024-03-15 10:30:45')" -> "3",
      "day(TIMESTAMP '2024-03-15 10:30:45')" -> "15",
      "hour(TIMESTAMP '2024-03-15 10:30:45')" -> "10",
      "minute(TIMESTAMP '2024-03-15 10:30:45')" -> "30",
      "second(TIMESTAMP '2024-03-15 10:30:45')" -> "45",
      "quarter(TIMESTAMP '2024-03-15 00:00:00')" -> "1",
      "dayofyear(TIMESTAMP '2024-02-01 00:00:00')" -> "32",
      "weekofyear(TIMESTAMP '2024-01-04 00:00:00')" -> "1",
      "day_of_week(TIMESTAMP '2024-01-01 00:00:00')" -> "1", // Monday, ISO
      "year_of_week(TIMESTAMP '2021-01-01 00:00:00')" -> "2020",
      "last_day(DATE '2024-02-10')" -> "2024-02-29",
      "date_trunc('hour', TIMESTAMP '2024-03-15 10:30:45')" -> "2024-03-15 10:00:00.0",
      "date_add(day, 1, TIMESTAMP '2024-02-28 00:00:00')" -> "2024-02-29T00:00",
      "date_diff(day, TIMESTAMP '2024-01-01 00:00:00', TIMESTAMP '2024-02-01 00:00:00')" -> "31",
      "datediff(DATE '2024-02-01', DATE '2024-01-01')" -> "31",
      "add_months(DATE '2024-01-31', 1)" -> "2024-02-29",
      "months_between(DATE '2024-03-01', DATE '2024-01-01')" -> "2.0",
      "next_day(DATE '2024-01-01', 'Friday')" -> "2024-01-05",
      "unix_timestamp(TIMESTAMP_LTZ '1970-01-01 00:00:10')" -> "10",
      "date_format(TIMESTAMP '2024-03-05 07:08:09', 'yyyy/MM/dd HH:mm:ss')" -> "2024/03/05 07:08:09",
      "to_iso8601(TIMESTAMP '2024-03-05 07:08:09')" -> "2024-03-05T07:08:09.000",
      "mysql_date_format(TIMESTAMP '2024-03-05 07:08:09', '%d.%m.%Y')" -> "05.03.2024",
      "extract(YEAR FROM TIMESTAMP '2024-03-15 00:00:00')" -> "2024"))
  }

  test("array function values (exceeds reference: theirs are NotImplemented)") {
    check(Seq(
      "size(array(1, 2, 3))" -> "3",
      "cardinality(array(1, 2))" -> "2",
      "element_at(array('a', 'b'), 2)" -> "b",
      "array_contains(array(1, 2), 2)" -> "true",
      "array_position(array('a', 'b'), 'b')" -> "2",
      "array_distinct(array(1, 1, 2))" -> "ArraySeq(1, 2)",
      "array_max(array(3, 1, 2))" -> "3",
      "array_min(array(3, 1, 2))" -> "1",
      "array_remove(array(1, 2, 1), 1)" -> "ArraySeq(2)",
      "array_sort(array(3, 1, 2))" -> "ArraySeq(1, 2, 3)",
      "arrays_overlap(array(1, 2), array(2, 3))" -> "true",
      "array_union(array(1, 2), array(2, 3))" -> "ArraySeq(1, 2, 3)",
      "array_intersect(array(1, 2), array(2, 3))" -> "ArraySeq(2)",
      "array_except(array(1, 2), array(2))" -> "ArraySeq(1)",
      "array_join(array('a', 'b'), '-')" -> "a-b",
      "flatten(array(array(1), array(2)))" -> "ArraySeq(1, 2)",
      "reverse(array(1, 2, 3))" -> "ArraySeq(3, 2, 1)",
      "sequence(1, 4)" -> "ArraySeq(1, 2, 3, 4)",
      "slice(array(1, 2, 3, 4), 2, 2)" -> "ArraySeq(2, 3)",
      "array_repeat('x', 3)" -> "ArraySeq(x, x, x)",
      "array_compact(array(1, null, 2))" -> "ArraySeq(1, 2)",
      "zip_with(array(1, 2), array(10, 20), (x, y) -> x + y)" -> "ArraySeq(11, 22)",
      "aggregate(array(1, 2, 3), 0, (acc, x) -> acc + x)" -> "6",
      "transform(array(1, 2), x -> x * 2)" -> "ArraySeq(2, 4)",
      "filter(array(1, 2, 3), x -> x > 1)" -> "ArraySeq(2, 3)",
      "exists(array(1, 2), x -> x = 2)" -> "true",
      "forall(array(1, 2), x -> x > 0)" -> "true"))
  }

  test("conditional / conversion values") {
    check(Seq(
      "coalesce(NULL, NULL, 3)" -> "3",
      "nullif(1, 1)" -> "null",
      "nullif(1, 2)" -> "1",
      "if(1 > 2, 'a', 'b')" -> "b",
      "nvl(NULL, 'x')" -> "x",
      "nvl2(NULL, 'a', 'b')" -> "b",
      "try_cast('abc' AS INT)" -> "null",
      "try_cast('42' AS INT)" -> "42",
      "try_divide(1, 0)" -> "null",
      "try(1)" -> "1",
      "cast('2024-01-01' AS DATE)" -> "2024-01-01",
      "typeof(1.5)" -> "decimal(2,1)",
      "typeof('x')" -> "string"))
  }

  test("binary / encoding values") {
    check(Seq(
      "md5('abc')" -> "900150983cd24fb0d6963f7d28e17f72",
      "sha1('abc')" -> "a9993e364706816aba3e25717850c26c9cd0d89d",
      "sha2('abc', 256)" -> "ba7816bf8f01cfea414140de5dae2223b00361a396177a9cb410ff61f20015ad",
      "crc32('abc')" -> "891568578",
      "hex('AB')" -> "4142",
      "cast(unhex('4142') AS STRING)" -> "AB",
      "base64(to_utf8('abc'))" -> "YWJj",
      "cast(unbase64('YWJj') AS STRING)" -> "abc",
      "to_base32('foo')" -> "MZXW6===",
      "xxhash64('abc') = xxhash64('abc')" -> "true",
      "url_encode('a b')" -> "a+b",
      "url_decode('a+b')" -> "a b"))
  }

  test("json extract/build values (reference filter.rs:5263-5304, 5606-5623)") {
    check(Seq(
      // json_extract keeps JSON text form (strings stay quoted)
      "json_extract('{\"name\": \"John\"}', '$.name')" -> "\"John\"",
      "json_extract('{\"a\": {\"b\": 42}}', '$.a.b')" -> "42",
      "json_extract('{\"a\": [1,2,3]}', '$.a')" -> "[1,2,3]",
      "json_extract('{\"a\": 1}', '$.missing')" -> "null",
      // json_extract_scalar unquotes scalars; containers -> NULL
      "json_extract_scalar('{\"name\": \"John\"}', '$.name')" -> "John",
      "json_extract_scalar('{\"a\": 1.5}', '$.a')" -> "1.5",
      "json_extract_scalar('{\"a\": [1]}', '$.a')" -> "null",
      "json_object('k', 'v')" -> "{\"k\":\"v\"}",
      "json_object('a', 1, 'b', 'x')" -> "{\"a\":1,\"b\":\"x\"}",
      "json_array(1, 2, 3)" -> "[1,2,3]",
      "json_array('a', 1, true)" -> "[\"a\",1,true]",
      // reference parity extras surfaced by RefSqlSweepSpec
      "is_nan(sqrt(-1.0))" -> "true",
      "is_nan(1.0)" -> "false",
      "timezone(now())" -> "UTC",
      "sha512('abc')" -> ("ddaf35a193617abacc417349ae20413112e6fa4e89a97ea20a9eeee64b55d39a" +
        "2192992a274fc1a836ba3c23a3feebbd454d4423643ce80e2a9ac94fa54ca49f"),
      "(SELECT bitwise_and_agg(x) FROM VALUES (12),(10) t(x))" -> "8",
      "(SELECT bitwise_or_agg(x) FROM VALUES (4),(1) t(x))" -> "5"))
  }

  test("binder name-parity values (BinderParitySpec gap closures)") {
    check(Seq(
      "array_concat(array(1,2), array(3))" -> "ArraySeq(1, 2, 3)",
      "array_first(array(7,8,9))" -> "7",
      "array_last(array(7,8,9))" -> "9",
      "array_first(array())" -> "null",
      "array_length(array(1,2,3))" -> "3",
      "array_reverse(array(1,2,3))" -> "ArraySeq(3, 2, 1)",
      "trim_array(array(1,2,3,4), 2)" -> "ArraySeq(1, 2)",
      "bit_not(0)" -> "-1",
      "ngrams(array('a','b','c','d'), 2)" ->
        "ArraySeq(ArraySeq(a, b), ArraySeq(b, c), ArraySeq(c, d))",
      "ngrams(array('a','b'), 5)" -> "ArraySeq(ArraySeq(a, b))",
      "combinations(array(1,2,3), 2)" ->
        "ArraySeq(ArraySeq(1, 2), ArraySeq(1, 3), ArraySeq(2, 3))",
      "combinations(array(1,2), 0)" -> "ArraySeq(ArraySeq())",
      "contains_sequence(array(1,2,3,4), array(2,3))" -> "true",
      "contains_sequence(array(1,2,3,4), array(2,4))" -> "false",
      "contains_sequence(array(1,2), array())" -> "true",
      "millisecond(TIMESTAMP '2024-06-01 12:34:56.789')" -> "789",
      // pre-epoch: Rust's sign-preserving % / truncating / (r4 advisory) —
      // -750000us % 1e6 = -750000, / 1000 = -750
      "millisecond(TIMESTAMP '1969-12-31 23:59:59.250')" -> "-750",
      "millisecond(TIMESTAMP '1969-12-31 23:59:59.999750')" -> "0",
      "(SELECT var(x) FROM VALUES (1.0),(3.0) t(x))" -> "2.0",
      "(SELECT bitwise_xor_agg(x) FROM VALUES (12),(10) t(x))" -> "6",
      "(SELECT group_concat(x, ',') FROM VALUES ('a'),('b') t(x))" -> "a,b",
      "zip(array(1,2), array('x','y'))" -> "ArraySeq([1,x], [2,y])",
      "localtime() BETWEEN 0 AND 86399999999" -> "true"))
  }

  test("murmur3 matches the published x86_32 verification vectors; parse_duration sub-second") {
    check(Seq(
      // the same vectors scripts/gen_hash_expected.py asserts —
      // 0x248bfa47 and 0x2e4ff723, canonical MurmurHash3 x86_32 seed 0
      "murmur3('')" -> "0",
      "murmur3('hello')" -> 0x248bfa47.toString,
      "murmur3('The quick brown fox jumps over the lazy dog')" ->
        0x2e4ff723.toString,
      "murmur3(CAST('hello' AS BINARY))" -> 0x248bfa47.toString,
      "murmur3(CAST(NULL AS STRING))" -> "null",
      // bare untyped NULL (NullType) must null-short-circuit, not be
      // rejected by the input-type check
      "murmur3(NULL)" -> "null",
      // micros precision through the interval: 1500ns rounds half-up
      // to 2us; 750us and 1.5ms land exactly
      "CAST(parse_duration('1500ns') AS STRING)" ->
        "INTERVAL '0 00:00:00.000002' DAY TO SECOND",
      "CAST(parse_duration('750us') AS STRING)" ->
        "INTERVAL '0 00:00:00.00075' DAY TO SECOND",
      "CAST(parse_duration('1.5ms') AS STRING)" ->
        "INTERVAL '0 00:00:00.0015' DAY TO SECOND",
      "CAST(parse_duration('2.5m') AS STRING)" ->
        "INTERVAL '0 00:02:30' DAY TO SECOND",
      "CAST(parse_duration(' 1.5 h ') AS STRING)" ->
        "INTERVAL '0 01:30:00' DAY TO SECOND",
      "CAST(parse_duration('2d') AS BIGINT)" -> "172800"))
    // invalid literal refuses like Trino (not null, not zero)
    Engine.registerDir(spark, sf0001)
    val bad = intercept[Exception](
      spark.sql("SELECT parse_duration('5 parsecs')").collect())
    assert(bad.getMessage.contains("invalid duration"), bad.getMessage)
    // murmur3 over a non-string/binary input is a typed ANALYSIS error
    // (the reference raises a typed QueryError for its hash functions),
    // not a runtime MatchError mid-job
    val typeErr = intercept[org.apache.spark.sql.AnalysisException](
      spark.sql("SELECT murmur3(123)").collect())
    assert(typeErr.getMessage.contains("string or binary"), typeErr.getMessage)
  }

  test("json_object error semantics: NULL key is a runtime error, odd arity an analysis error") {
    Engine.registerDir(spark, sf0001)
    // NULL key: Trino/reference raise; silently mapping to "" would
    // fabricate a key (r4 advisory)
    val e1 = intercept[Exception] {
      spark.sql("SELECT json_object(cast(null as string), 1) AS v").collect()
    }
    assert(e1.getMessage != null)
    // odd arity: surfaced as an analysis-time type-check failure, not a
    // raw require() IllegalArgumentException from deep in planning
    val e2 = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT json_object('a', 1, 'dangling') AS v").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("even number"), e2.getMessage)
  }
}
