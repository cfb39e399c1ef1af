package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.json4s._
import org.json4s.jackson.JsonMethods

/** Minimal Iceberg-style table reader, mirroring the *actual* behavior
  * of the reference's `IcebergScanExec` (`/root/reference/src/physical/
  * operators/iceberg.rs:111-630`) — which reads a JSON-simplified
  * layout, not the full Iceberg spec (no Avro manifests, no deletes,
  * no schema evolution):
  *
  *   table/metadata/v0.metadata.json        {format_version, uuid, current_snapshot_id}
  *   table/metadata/snap-<id>.snapshot.json {snapshot_id, parent_snapshot_id, manifest_list}
  *   <manifest_list>                        [{manifest_path, ...}, ...]
  *   <manifest>                             {"entries": [{"data_file": {file_path,
  *                                            file_format, partition, record_count, ...}}]}
  *
  * Capabilities mirrored: current-snapshot resolution, time travel via
  * an explicit snapshot id (`iceberg.rs:148`), partition-value pruning
  * (`PartitionFilter.matches`, `iceberg.rs:540-560`), then streaming the
  * surviving parquet files — here by handing the pruned file list to
  * Spark's vectorized parquet reader, which adds its own row-group
  * pruning/pushdown on top (the reference does that part manually).
  *
  * For real Iceberg tables one would use iceberg-spark-runtime (jar not
  * present in this environment — SURVEY §7.6).
  */
object IcebergLite {

  final case class DataFile(
      filePath: String,
      fileFormat: String,
      partition: Map[String, String],
      recordCount: Long)

  /** Partition-value predicates (string-typed, like the reference). */
  sealed trait PartitionFilter {
    def matches(f: DataFile): Boolean
  }
  final case class Eq(column: String, value: String) extends PartitionFilter {
    def matches(f: DataFile): Boolean = f.partition.get(column).contains(value)
  }
  final case class Gt(column: String, value: String) extends PartitionFilter {
    def matches(f: DataFile): Boolean = numCmp(f, column, _ > value.toLong)
  }
  final case class Lt(column: String, value: String) extends PartitionFilter {
    def matches(f: DataFile): Boolean = numCmp(f, column, _ < value.toLong)
  }
  final case class In(column: String, values: Seq[String]) extends PartitionFilter {
    def matches(f: DataFile): Boolean = f.partition.get(column).exists(values.contains)
  }
  private def numCmp(f: DataFile, column: String, cmp: Long => Boolean): Boolean =
    f.partition.get(column).exists(v => v.toLongOption.exists(cmp))

  private implicit val formats: Formats = DefaultFormats

  private def readJson(path: String): JValue =
    JsonMethods.parse(Files.readString(Paths.get(path)))

  /** Current snapshot id from table metadata (None = empty table). */
  def currentSnapshotId(tablePath: String): Option[Long] =
    (readJson(s"$tablePath/metadata/v0.metadata.json") \ "current_snapshot_id")
      .toOption.collect { case JInt(n) => n.toLong }

  /** All snapshot ids present in the metadata dir (time-travel targets). */
  def snapshots(tablePath: String): Seq[Long] = {
    val dir = new java.io.File(s"$tablePath/metadata")
    Option(dir.listFiles()).getOrElse(Array.empty).toSeq
      .map(_.getName)
      .collect { case n if n.startsWith("snap-") && n.endsWith(".snapshot.json") =>
        n.stripPrefix("snap-").stripSuffix(".snapshot.json").toLong
      }.sorted
  }

  /** Live data files of a snapshot, after partition pruning. */
  def dataFiles(tablePath: String, snapshotId: Option[Long] = None,
      filters: Seq[PartitionFilter] = Nil): Seq[DataFile] = {
    val snap = snapshotId.orElse(currentSnapshotId(tablePath)) match {
      case None => return Nil
      case Some(id) => readJson(s"$tablePath/metadata/snap-$id.snapshot.json")
    }
    val manifestList = (snap \ "manifest_list").extract[String]
    val manifests = readJson(s"$tablePath/$manifestList") match {
      case JArray(ms) => ms.map(m => (m \ "manifest_path").extract[String])
      case _ => Nil
    }
    val files = manifests.flatMap { mp =>
      (readJson(s"$tablePath/$mp") \ "entries") match {
        case JArray(entries) =>
          entries.flatMap { e =>
            (e \ "data_file").toOption.map { df =>
              DataFile(
                filePath = (df \ "file_path").extract[String],
                fileFormat = (df \ "file_format").extractOrElse[String]("PARQUET"),
                partition = (df \ "partition").extractOrElse[Map[String, String]](Map.empty),
                recordCount = (df \ "record_count").extractOrElse[Long](0L))
            }
          }
        case _ => Nil
      }
    }
    files.filter(f => filters.forall(_.matches(f)))
  }

  /** Read a snapshot of the table as a DataFrame: metadata-pruned file
    * list → Spark's parquet reader (pushdown/row-group pruning apply on
    * top). Partition values are attached as columns so partition
    * predicates stay usable in SQL. */
  def read(spark: SparkSession, tablePath: String, snapshotId: Option[Long] = None,
      filters: Seq[PartitionFilter] = Nil): DataFrame = {
    val files = dataFiles(tablePath, snapshotId, filters)
    if (files.isEmpty) {
      return spark.emptyDataFrame
    }
    val partCols = files.flatMap(_.partition.keys).distinct.sorted
    // one read per distinct partition tuple, partition values as literals
    val grouped = files.groupBy(_.partition)
    grouped.map { case (part, fs) =>
      val df = spark.read.parquet(fs.map(f => s"$tablePath/${f.filePath}"): _*)
      partCols.foldLeft(df)((d, c) =>
        d.withColumn(c, org.apache.spark.sql.functions.lit(part.getOrElse(c, null: String))))
    }.reduce(_ unionByName _)
  }
}
