package graft

/** Minimal SQL REPL over the registered testdata (reference entry point
  * C, `src/main.rs:453` + `src/cli/`): line in → spark.sql → table out.
  * Dot-commands: .tables, .schema <t>, .explain <sql>, .quit.
  */
object Repl {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Engine.session()
    Engine.registerDir(spark, sfDir)
    println(s"graft repl — tables from $sfDir (.tables/.schema/.explain/.quit)")
    val in = new java.io.BufferedReader(new java.io.InputStreamReader(System.in))
    var line = in.readLine()
    while (line != null && line.trim != ".quit") {
      val q = line.trim
      try {
        if (q.isEmpty) {}
        else if (q == ".tables") Engine.tableNames.foreach(println)
        else if (q.startsWith(".schema")) spark.table(q.split("\\s+")(1)).printSchema()
        else if (q.startsWith(".explain")) spark.sql(q.stripPrefix(".explain").trim).explain("formatted")
        else spark.sql(q).show(50, truncate = false)
      } catch {
        case e: Throwable => println(s"error: ${e.getMessage}")
      }
      line = in.readLine()
    }
    spark.stop()
  }
}
