package graft

import java.nio.file.{Files, Paths}

/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {

  /** The DIFFER CONTRACT, machine-enforced (r15 lesson: two rows
    * shipped `ARRAY<DOUBLE>` columns that crashed the driver's
    * pandas row sort — `TypeError: unhashable type` — while the
    * builder's local gate normalized them away): any oracle-carrying
    * row must expose ONLY scalar top-level columns. Arrays belong
    * flattened (posexplode per dimension, or array_join) BEFORE the
    * catalog boundary. Throws with the offending columns named. */
  private[graft] def assertScalarColumns(
      name: String, schema: org.apache.spark.sql.types.StructType): Unit = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    val complex = schema.fields.collect {
      case f if f.dataType.isInstanceOf[ArrayType] ||
        f.dataType.isInstanceOf[MapType] ||
        f.dataType.isInstanceOf[StructType] => s"${f.name}: ${f.dataType.sql}"
    }
    require(complex.isEmpty,
      s"differ contract violation in '$name': oracle-carrying rows must " +
        s"have scalar top-level columns only (the driver's row sort " +
        s"cannot hash arrays/structs/maps) — flatten [${complex.mkString(", ")}] " +
        s"via posexplode/array_join before the catalog boundary")
  }

  def main(args: Array[String]): Unit = {
    val (sfDir, outDir) = (args(0), args(1))
    // optional 3rd arg: comma-separated name substrings (dev loop filter)
    val filter: String => Boolean =
      if (args.length > 2) { val pats = args(2).split(","); n => pats.exists(n.contains) }
      else _ => true
    val spark = Engine.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
    new java.io.File(outDir).mkdirs()
    var nOk, nFail = 0
    val failed = scala.collection.mutable.ListBuffer.empty[String]
    SparkEntry.queries.toSeq.sortBy(_._1).filter(p => filter(p._1)).foreach { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        if (SparkEntry.oracleSql.contains(name)) assertScalarColumns(name, df.schema)
        df.coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        nOk += 1
      } catch { case e: Throwable =>
        nFail += 1
        failed += name
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
    // Compact one-line summary printed LAST (same tail-truncation
    // discipline as Bench's contract line — r03 lesson): per-query
    // detail lives above on stderr; this line alone says whether every
    // dump succeeded, however large the catalog grows.
    val failList = failed.take(20).map(q).mkString("[", ",", "]")
    println(s"""{"verify_dumped":$nOk,"verify_failed":$nFail,"failed_names":$failList,"oracles":${SparkEntry.oracleSql.size},"sf":${q(sfDir)}}""")
  }
}
