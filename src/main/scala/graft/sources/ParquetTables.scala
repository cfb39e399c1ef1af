package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Parquet table loading with TIMESTAMP(NANOS) repair.
  *
  * The driver's testdata is written with nanosecond-precision parquet
  * timestamps, which Spark's reader rejects ([PARQUET_TYPE_ILLEGAL]).
  * The reference engine reads them natively through Arrow
  * (`/root/reference/src/storage/parquet.rs:26-60`). Here we read NANOS
  * columns as raw longs (`spark.sql.legacy.parquet.nanosAsLong`) and
  * cast to TIMESTAMP_NTZ (ns → µs is lossless for this data; session tz
  * pinned UTC). Columns are detected from the parquet footer's logical
  * type annotations, not by name, so any table shape works.
  */
object ParquetTables {

  /** Names of columns annotated TIMESTAMP(NANOS) in the file footer. */
  def nanoTimestampColumns(path: String, conf: Configuration): Seq[String] = {
    val file = firstParquetFile(new java.io.File(path))
    if (file.isEmpty) return Nil
    val in = HadoopInputFile.fromPath(new Path(file.get.getPath), conf)
    val reader = ParquetFileReader.open(in)
    try {
      reader.getFooter.getFileMetaData.getSchema.getFields.asScala.collect {
        case f if f.isPrimitive && isNanoTimestamp(f.getLogicalTypeAnnotation) =>
          f.getName
      }.toSeq
    } finally reader.close()
  }

  private def isNanoTimestamp(ann: LogicalTypeAnnotation): Boolean = ann match {
    case t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation =>
      t.getUnit == LogicalTypeAnnotation.TimeUnit.NANOS
    case _ => false
  }

  private def firstParquetFile(f: java.io.File): Option[java.io.File] =
    if (f.isFile) Some(f)
    else
      Option(f.listFiles()).getOrElse(Array.empty)
        .filter(x => x.isFile && x.getName.endsWith(".parquet"))
        .sortBy(_.getName).headOption

  /** Read a parquet file/dir, converting NANOS columns to TIMESTAMP_NTZ. */
  def read(spark: SparkSession, path: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path)
    val nsCols = nanoTimestampColumns(path, spark.sparkContext.hadoopConfiguration)
    nsCols.foldLeft(raw) { (df, c) =>
      df.withColumn(c, expr(s"cast(timestamp_micros(`$c` div 1000) as timestamp_ntz)"))
    }
  }
}
