package graft

/** Alternating code/quoted segmentation of a SQL string: even indices
  * are code, odd indices are quoted segments returned VERBATIM with
  * their quotes. `''`/`""` doubling always escapes the closing quote;
  * backslash escapes inside single-quoted literals are honored when
  * `backslashInSingleQuotes` (Spark's default dialect accepts `'it\'s'`)
  * and ignored otherwise (DuckDB, where `\` is an ordinary character).
  * Double-quoted segments have backslash escapes only when
  * `backslashInDoubleQuotes`: with Spark's
  * `spark.sql.ansi.doubleQuotedIdentifiers=false` (the vanilla
  * default) `"..."` is a string LITERAL with backslash escapes; with
  * it true (what Engine.session sets) `"..."` is an identifier and `\`
  * is ordinary — callers must pass what the session they rewrite for
  * actually parses (TrinoDialectParser reads the live conf).
  *
  * Shared by the Trino-dialect parser rewrites
  * (plans/GraftExtensions.scala) and the golden-oracle table redirect
  * (queries/RefGoldenQueries.scala) so the two sides' notion of
  * "inside a literal" cannot drift — a quoting bug fixed in one walker
  * is fixed in both.
  */
object SqlText {

  def splitQuoted(sql: String, backslashInSingleQuotes: Boolean,
      backslashInDoubleQuotes: Boolean = false): Vector[String] = {
    val out = Vector.newBuilder[String]
    val cur = new StringBuilder
    var i = 0
    while (i < sql.length) {
      val c = sql.charAt(i)
      if (c == '\'' || c == '"') {
        out += cur.toString; cur.clear()
        val lit = new StringBuilder
        lit.append(c); i += 1
        var closed = false
        while (!closed && i < sql.length) {
          val ch = sql.charAt(i)
          lit.append(ch); i += 1
          val bs = if (c == '\'') backslashInSingleQuotes else backslashInDoubleQuotes
          if (ch == '\\' && bs && i < sql.length) {
            // escaped char: consume it so an escaped quote can't close
            lit.append(sql.charAt(i)); i += 1
          } else if (ch == c) {
            if (i < sql.length && sql.charAt(i) == c) { lit.append(c); i += 1 }
            else closed = true
          }
        }
        out += lit.toString
      } else { cur.append(c); i += 1 }
    }
    out += cur.toString
    out.result() // code at even indices, quoted at odd
  }

  /** Apply `f` to each CODE segment, passing quoted segments through
    * verbatim. */
  def mapCode(sql: String, backslashInSingleQuotes: Boolean)(
      f: String => String): String =
    splitQuoted(sql, backslashInSingleQuotes).zipWithIndex.map {
      case (seg, i) => if (i % 2 == 0) f(seg) else seg
    }.mkString
}
