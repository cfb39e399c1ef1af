package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.GraftColumnBridge.{toCol, toExpr}
import org.apache.spark.sql.functions._

import graft.functions.expressions.ByteHistogram

/** Multimodal-column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, plus decode / feature-extract /
  * resize / frame-sample transforms.
  *
  * The actual media codecs are STUBBED (this container has no image/
  * audio libraries): `decodeStub` fabricates deterministic metadata from
  * the bytes, and feature extraction is a byte-value histogram. The
  * Spark-side plumbing — schema, binary slicing, per-partition batch
  * iteration, explode-based frame fan-out, fixed-width float vectors —
  * is real and is exactly what a production decoder would ride on
  * (swap the kernel inside `mapPartitions`, keep the plan).
  */
object Multimodal {

  /** media schema: (media_id, data binary, meta struct<kind,width,height,n_frames>) */
  val metaFields = Seq("kind", "width", "height", "n_frames")

  /** Pack documents as fake media rows: data = utf8 bytes of the text,
    * meta derived deterministically from n_chars (so oracles can verify
    * the arithmetic without touching the binary). */
  def packDocsAsMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("data"),
      struct(
        element_at(array(lit("image"), lit("audio"), lit("video")),
          (col("doc_id") % 3 + 1).cast("int")).as("kind"),
        (col("n_chars") % 640 + 16).cast("int").as("width"),
        (col("n_chars") % 480 + 16).cast("int").as("height"),
        (col("n_chars") % 5 + 1).cast("int").as("n_frames")).as("meta"))

  /** STUB decode: the stub's outputs (`n_bytes`, FNV-64 `content_hash`)
    * are per-row pure functions, so decode is a plain projection —
    * `octet_length` + the `Fnv1a64` expression — with zero extra
    * shuffles and DuckDB-recomputable outputs (oracle-checkable).
    * A real codec plugs in via `decodeWithCodec` below. */
  def decodeStub(spark: SparkSession, media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("data")))
      .withColumn("content_hash",
        toCol(graft.functions.expressions.Fnv1a64(toExpr(col("data")))))

  /** The seam for a REAL media codec: per-partition batch iteration so
    * decoder init amortizes across a partition (the Scala analogue of a
    * pandas-batched UDF). Narrow — output stays in the same partition,
    * no join-back. Unused by the stub path; kept as the documented
    * plug-in point, exercised by MultimodalSpec. */
  def decodeWithCodec[T: org.apache.spark.sql.Encoder](
      media: DataFrame)(codec: Iterator[Row] => Iterator[T]): Dataset[T] =
    media.mapPartitions(codec)(implicitly)

  /** Feature extraction: binary → fixed-width array<float> (L1-normalized
    * byte histogram — the deterministic stand-in for an image embedding). */
  def extractFeatures(media: DataFrame, bins: Int = 16): DataFrame =
    media.withColumn("features", toCol(ByteHistogram(toExpr(col("data")), bins)))

  /** Resize stub: pure metadata transform (a decoder would also
    * re-encode `data`; the plan shape is identical). */
  def resizeStub(media: DataFrame, maxW: Int, maxH: Int): DataFrame =
    media.withColumn("meta",
      struct(
        col("meta.kind"),
        least(col("meta.width"), lit(maxW)).as("width"),
        least(col("meta.height"), lit(maxH)).as("height"),
        col("meta.n_frames")))

  /** Frame sampling: fan a "video" row out to one row per sampled frame,
    * slicing the byte payload evenly — posexplode keeps the frame index.
    * At scale this is a narrow transform (no shuffle); frame counts are
    * data-driven per row. */
  def frameSample(media: DataFrame, every: Int = 1): DataFrame = {
    val n = col("meta.n_frames")
    val frameLen = greatest(floor(octet_length(col("data")) / n), lit(1)).cast("int")
    media
      .select(col("media_id"), col("data"), col("meta"), frameLen.as("frame_len"),
        posexplode(sequence(lit(0), n - 1)).as(Seq("frame_idx", "frame_no")))
      .filter(col("frame_idx") % every === 0)
      .select(
        col("media_id"), col("frame_idx"),
        col("data").substr(col("frame_idx") * col("frame_len") + 1, col("frame_len"))
          .as("frame_bytes"),
        octet_length(col("data").substr(col("frame_idx") * col("frame_len") + 1,
          col("frame_len"))).as("frame_n_bytes"))
  }
}
