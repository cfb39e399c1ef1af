object Probe {
  def main(args: Array[String]): Unit = {
    val spark = graft.Engine.session()
    import spark.implicits._
    val d = "/tmp/widen_probe"
    Seq((1, "a")).toDF("x", "v").write.mode("overwrite").parquet(d + "/f1")
    Seq((2L, "b")).toDF("x", "v").write.mode("overwrite").parquet(d + "/f2")
    // 1) mergeSchema over int + long files
    try {
      val m = spark.read.option("mergeSchema", "true")
        .parquet(d + "/f1", d + "/f2")
      println("MERGE OK schema=" + m.schema.simpleString)
      m.collect().foreach(r => println("row " + r))
    } catch { case e: Throwable => println("MERGE FAIL " + e.getMessage.take(200)) }
    // 2) explicit long schema over the int file
    try {
      val s2 = spark.read.schema("x LONG, v STRING").parquet(d + "/f1")
      s2.collect().foreach(r => println("explicit-long row " + r))
    } catch { case e: Throwable => println("EXPLICIT FAIL " + e.getMessage.take(300)) }
    // 3) float -> double
    Seq((1.5f, "a")).toDF("y", "v").write.mode("overwrite").parquet(d + "/g1")
    try {
      val s3 = spark.read.schema("y DOUBLE, v STRING").parquet(d + "/g1")
      s3.collect().foreach(r => println("float-as-double row " + r))
    } catch { case e: Throwable => println("FLOAT FAIL " + e.getMessage.take(300)) }
    spark.stop()
  }
}
