package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.SparkSession

/** Generator for the committed IcebergLite demo table at
  * `data/iceberg_demo` — a two-snapshot, region-partitioned `sales`
  * table in the reference's JSON metadata layout
  * (`/root/reference/src/physical/operators/iceberg.rs:111-630`),
  * including per-file column `lower_bounds`/`upper_bounds` so file-level
  * min/max pruning (iceberg.rs:354-507) is exercised end-to-end.
  *
  * Layout (hive-style data paths so the DuckDB oracle can recover the
  * partition column with `hive_partitioning`; the parquet files
  * themselves carry only (id, amount) — region lives in the manifest):
  *
  *   snapshot 1: region=EU/sales-eu-1 (ids 1-3), region=US/sales-us-1 (ids 4-6)
  *   snapshot 2: + region=AP/sales-ap-1 (ids 7-9), region=EU/sales-eu-2 (ids 10-12)
  *
  * Deterministic: fixed rows, fixed file names — regenerate with
  * `sbt "runMain graft.sources.IcebergDemo"` (idempotent).
  */
object IcebergDemo {

  val defaultPath = "/root/repo/data/iceberg_demo"

  /** (fileName, region, rows as (id, amount)) */
  private val fileSpecs: Seq[(String, String, Seq[(Long, Double)])] = Seq(
    ("sales-eu-1", "EU", Seq((1L, 10.5), (2L, 20.25), (3L, 30.75))),
    ("sales-us-1", "US", Seq((4L, 40.0), (5L, 55.5), (6L, 61.25))),
    ("sales-ap-1", "AP", Seq((7L, 70.75), (8L, 88.0), (9L, 99.5))),
    ("sales-eu-2", "EU", Seq((10L, 101.25), (11L, 115.0), (12L, 128.5))))

  private val snap1Files = Set("sales-eu-1", "sales-us-1")

  def write(spark: SparkSession, root: String): Unit = {
    import spark.implicits._
    Files.createDirectories(Paths.get(s"$root/metadata"))

    def relPath(name: String, region: String) = s"data/region=$region/$name.parquet"

    fileSpecs.foreach { case (name, region, rows) =>
      val dir = Paths.get(s"$root/data/region=$region")
      Files.createDirectories(dir)
      val tmp = Files.createTempDirectory("iceberg_demo_part").toString
      rows.toDF("id", "amount").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles().filter(_.getName.endsWith(".parquet")).head
      Files.move(part.toPath, dir.resolve(s"$name.parquet"), StandardCopyOption.REPLACE_EXISTING)
    }

    def entry(name: String, region: String, rows: Seq[(Long, Double)], seq: Long): String = {
      val ids = rows.map(_._1); val amts = rows.map(_._2)
      s"""{"data_file": {"file_path": "${relPath(name, region)}", "file_format": "PARQUET",
         |  "partition": {"region": "$region"}, "record_count": ${rows.size},
         |  "sequence_number": $seq,
         |  "lower_bounds": {"id": "${ids.min}", "amount": "${amts.min}"},
         |  "upper_bounds": {"id": "${ids.max}", "amount": "${amts.max}"}}}""".stripMargin
    }
    def manifest(names: Set[String], seq: Long): String =
      fileSpecs.filter(f => names(f._1))
        .map { case (n, r, rows) => entry(n, r, rows, seq) }.mkString("{\"entries\": [", ",\n", "]}")
    def put(path: String, content: String): Unit =
      Files.writeString(Paths.get(s"$root/$path"), content)

    put("metadata/manifest-1.json", manifest(snap1Files, seq = 1))
    put("metadata/manifest-2.json", manifest(fileSpecs.map(_._1).toSet -- snap1Files, seq = 2))
    put("metadata/manifest-list-1.json",
      """[{"manifest_path": "metadata/manifest-1.json", "manifest_length": 1,
        |  "partition_spec_id": 0, "snapshot_id": 1, "sequence_number": 1}]""".stripMargin)
    put("metadata/manifest-list-2.json",
      """[{"manifest_path": "metadata/manifest-1.json", "manifest_length": 1,
        |  "partition_spec_id": 0, "snapshot_id": 1, "sequence_number": 1},
        | {"manifest_path": "metadata/manifest-2.json", "manifest_length": 1,
        |  "partition_spec_id": 0, "snapshot_id": 2, "sequence_number": 2}]""".stripMargin)
    put("metadata/snap-1.snapshot.json",
      """{"snapshot_id": 1, "sequence_number": 1, "operation": "append",
        | "manifest_list": "metadata/manifest-list-1.json"}""".stripMargin)
    put("metadata/snap-2.snapshot.json",
      """{"snapshot_id": 2, "sequence_number": 2, "parent_snapshot_id": 1,
        | "operation": "append",
        | "manifest_list": "metadata/manifest-list-2.json"}""".stripMargin)
    put("metadata/v0.metadata.json",
      """{"format_version": 2, "uuid": "graft-iceberg-demo", "current_snapshot_id": 2}""")
  }

  def main(args: Array[String]): Unit = {
    val root = if (args.nonEmpty) args(0) else defaultPath
    val spark = graft.Engine.session("4")
    write(spark, root)
    println(s"[iceberg-demo] wrote $root")
    spark.stop()
  }
}
