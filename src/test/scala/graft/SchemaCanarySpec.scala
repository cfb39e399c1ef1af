package graft

import org.scalatest.funsuite.AnyFunSuite

/** Schema-drift canary for the driver-generated testdata.
  *
  * The engine normalizes every testdata table through one seam
  * (ParquetTables.read repairs TIMESTAMP(NANOS) footers to
  * TIMESTAMP_NTZ; plain TIMESTAMP_MICROS arrives as TIMESTAMP_NTZ
  * natively) and the streaming path must agree with the batch path.
  * When the driver regenerates testdata with a different physical
  * encoding, this spec fails FIRST, naming the drifted table and
  * column — instead of an analysis error surfacing deep inside a
  * stream (the round-6 failure mode: events.ts changed NANOS→MICROS
  * and the stream-side repair broke while the batch side adapted).
  *
  * The pins are the NORMALIZED engine-side schemas, so a NANOS↔MICROS
  * flip in the footer is absorbed silently (both normalize to
  * TIMESTAMP_NTZ); only a genuine shape change (new column, renamed
  * column, changed logical type) trips the canary.
  */
class SchemaCanarySpec extends AnyFunSuite {
  import TestSpark._

  private val expected: Map[String, String] = Map(
    "region" -> "r_regionkey:INT, r_name:STRING",
    "nation" -> "n_nationkey:INT, n_name:STRING, n_regionkey:INT",
    "customer" -> ("c_custkey:BIGINT, c_name:STRING, c_nationkey:INT, " +
      "c_acctbal:DOUBLE, c_mktsegment:STRING"),
    "supplier" -> "s_suppkey:BIGINT, s_name:STRING, s_nationkey:INT, s_acctbal:DOUBLE",
    "part" -> ("p_partkey:BIGINT, p_name:STRING, p_brand:STRING, p_type:STRING, " +
      "p_size:INT, p_retailprice:DOUBLE"),
    "orders" -> ("o_orderkey:BIGINT, o_custkey:BIGINT, o_orderstatus:STRING, " +
      "o_totalprice:DOUBLE, o_orderdate:TIMESTAMP_NTZ, o_orderpriority:STRING"),
    "lineitem" -> ("l_orderkey:BIGINT, l_partkey:BIGINT, l_suppkey:BIGINT, " +
      "l_linenumber:INT, l_quantity:DOUBLE, l_extendedprice:DOUBLE, " +
      "l_discount:DOUBLE, l_tax:DOUBLE, l_returnflag:STRING, " +
      "l_linestatus:STRING, l_shipdate:TIMESTAMP_NTZ"),
    "events" -> ("event_id:BIGINT, ts:TIMESTAMP_NTZ, user_id:BIGINT, " +
      "event_type:STRING, value:DOUBLE, props:STRING"),
    "documents" -> "doc_id:BIGINT, text:STRING, lang:STRING, source:STRING, n_chars:BIGINT",
    "embeddings" -> "vec_id:BIGINT, embedding:ARRAY<FLOAT>, label:INT"
  )

  private def fmt(df: org.apache.spark.sql.DataFrame): String =
    df.schema.fields.map(f => s"${f.name}:${f.dataType.sql}").mkString(", ")

  private def diff(table: String, got: String): String = {
    val exp = expected(table).split(", ").toSeq
    val act = got.split(", ").toSeq
    val drifted = exp.zipAll(act, "<missing>", "<missing>")
      .collect { case (e, a) if e != a => s"expected [$e] got [$a]" }
    s"testdata changed: table `$table` drifted — ${drifted.mkString("; ")}"
  }

  expected.keys.toSeq.sorted.foreach { table =>
    test(s"batch normalized schema pinned: $table") {
      val got = fmt(Engine.t(spark, sf0001, table))
      assert(got == expected(table), diff(table, got))
    }
  }

  test("stream normalized schema pinned and batch-identical: events") {
    val got = fmt(streaming.EventStream.eventsStream(spark, sf0001))
    assert(got == expected("events"), diff("events", got))
  }
}
