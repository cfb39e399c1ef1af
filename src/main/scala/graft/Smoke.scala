package graft

/** Dev-only: print schemas + row counts of all driver testdata tables. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = Engine.session("4")
    Engine.tableNames.foreach { name =>
      val df = Engine.t(spark, sfDir, name)
      println(s"=== $name rows=${df.count()}")
      df.printSchema()
    }
    spark.stop()
  }
}
