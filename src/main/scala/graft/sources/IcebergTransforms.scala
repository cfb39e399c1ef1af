package graft.sources

import org.apache.spark.sql.catalyst.expressions.{Cast, DateFormatClass, Expression, Literal, Murmur3Hash, Pmod, Substring, Subtract}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Iceberg-style HIDDEN PARTITIONING: a table declares partition
  * TRANSFORMS over source columns (`bucket[N]`, `truncate[W]`,
  * `year`/`month`/`day`/`hour`, `identity`), writes derive the
  * partition value per row, and reads PRUNE from filters on the SOURCE
  * column alone — the user never names (or even sees) the partition
  * column. This mirrors the real Iceberg partition-spec contract
  * (spec §"Partition Transforms"; the reference's Iceberg surface,
  * iceberg.rs:354-507, prunes only identity hive partitions):
  *
  *  - the WRITE side derives each partition field with a Catalyst
  *    expression over the source column (codegen'd, scales with the
  *    write), and the derived column lives ONLY in the hive path +
  *    manifest — data files keep the source column, not the derived
  *    one, so the layout can change without rewriting readers;
  *  - the READ side PROJECTS source-column predicates through the
  *    transform into partition-tuple predicates (`Eq(ts, v)` →
  *    `Eq(ts_day, day(v))`, `Gt(ts, v)` → `GtEq(ts_day, day(v))` for
  *    monotone transforms; `Eq`/`In` only for `bucket`), evaluated by
  *    the IDENTICAL expression tree the write used — soundness (a file
  *    holding a matching row always survives pruning) is by
  *    construction, not by reimplementation.
  *
  * Temporal transforms evaluate in UTC regardless of session timezone,
  * exactly as the Iceberg spec defines them — the same literal projects
  * to the same partition value everywhere.
  */
object IcebergTransforms {

  private val TZ = Some("UTC")

  sealed trait Transform {
    /** tag persisted in `partition-spec.json`, e.g. `bucket[16]` */
    def tag: String
    /** field-name suffix: `id` + `bucket` → partition field `id_bucket` */
    def label: String
    /** order-preserving under the manifest's value comparator — lets
      * range predicates project through as `GtEq`/`LtEq` */
    def monotone: Boolean
    /** derived-partition-value expression over the source column — the
      * ONE definition both the write path and filter projection use */
    def expr(child: Expression, dt: DataType): Expression
  }

  case object Identity extends Transform {
    val tag = "identity"; val label = "identity"; val monotone = true
    def expr(child: Expression, dt: DataType): Expression = child
  }

  /** `pmod(murmur3(col), n)` — deterministic hash bucketing (Spark's
    * `hash()` is the same Murmur3_x86_32/seed-42 family real Iceberg's
    * bucket transform uses, applied to Spark's value encoding). */
  final case class Bucket(n: Int) extends Transform {
    require(n > 0, "bucket needs a positive bucket count")
    // the parameter is part of the FIELD NAME (`id_bucket4`), so two
    // spec versions bucketing the same source differently can never
    // share a partition field name — the collision that would make
    // cross-version filter projection unsound
    def tag = s"bucket[$n]"; def label = s"bucket$n"; val monotone = false
    def expr(child: Expression, dt: DataType): Expression =
      Pmod(new Murmur3Hash(Seq(child)), Literal(n))
  }

  /** Strings truncate to a prefix; integers floor to a multiple of the
    * width (`x - pmod(x, w)` — pmod's non-negative remainder makes
    * this a true floor for negatives too, the Iceberg contract). */
  final case class Truncate(w: Int) extends Transform {
    require(w > 0, "truncate needs a positive width")
    def tag = s"truncate[$w]"; def label = s"trunc$w"; val monotone = true
    def expr(child: Expression, dt: DataType): Expression = dt match {
      case StringType  => Substring(child, Literal(1), Literal(w))
      case LongType    => Subtract(child, Pmod(child, Literal(w.toLong)))
      case IntegerType => Subtract(child, Pmod(child, Literal(w)))
      case other => throw new IllegalArgumentException(
        s"truncate[$w] over ${other.simpleString} is not supported")
    }
  }

  /** Temporal transforms render a zero-padded UTC string (`yyyy`,
    * `yyyy-MM`, `yyyy-MM-dd`, `yyyy-MM-dd-HH`) so the manifest's
    * value comparator (numeric-first, then lexicographic) orders
    * partition values chronologically. */
  sealed abstract class Temporal(val label: String, pattern: String)
      extends Transform {
    def tag: String = label
    val monotone = true
    def expr(child: Expression, dt: DataType): Expression = {
      val ts = dt match {
        case TimestampType => child
        case TimestampNTZType | DateType | StringType =>
          Cast(child, TimestampType, TZ)
        case other => throw new IllegalArgumentException(
          s"$label over ${other.simpleString} is not supported")
      }
      DateFormatClass(ts, Literal(pattern), TZ)
    }
  }
  case object Year  extends Temporal("year", "yyyy")
  case object Month extends Temporal("month", "yyyy-MM")
  case object Day   extends Temporal("day", "yyyy-MM-dd")
  case object Hour  extends Temporal("hour", "yyyy-MM-dd-HH")

  def parseTransform(tag: String): Transform = tag match {
    case "identity" => Identity
    case "year" => Year
    case "month" => Month
    case "day" => Day
    case "hour" => Hour
    case b if b.startsWith("bucket[") && b.endsWith("]") =>
      Bucket(b.stripPrefix("bucket[").stripSuffix("]").toInt)
    case t if t.startsWith("truncate[") && t.endsWith("]") =>
      Truncate(t.stripPrefix("truncate[").stripSuffix("]").toInt)
    case other => throw new IllegalArgumentException(s"unknown transform: $other")
  }

  /** One partition field of a table's spec. `sourceType` is declared
    * at table creation (the DDL position real Iceberg reads it from
    * the schema) and checked against every written DataFrame — a
    * drifted type would silently change bucket hashes, so it fails
    * loudly instead. */
  final case class PartitionField(source: String, transform: Transform,
      sourceType: DataType) {
    def name: String = transform match {
      case Identity => source
      case t => s"${source}_${t.label}"
    }
  }

  /** The partition value a filter literal maps to, as the STRING the
    * hive path records — computed by folding the IDENTICAL expression
    * tree the write side uses over `Cast(v AS sourceType)`. `None`
    * (un-castable literal) disables projection for that filter, the
    * conservative direction. */
  def evalValue(f: PartitionField, v: String): Option[String] = {
    val lit = Cast(Literal(UTF8String.fromString(v), StringType), f.sourceType, TZ)
    val tree = Cast(f.transform.expr(lit, f.sourceType), StringType, TZ)
    try Option(tree.eval(null)).map(_.toString)
    catch { case scala.util.control.NonFatal(_) => None }
  }

  /** Whether a RANGE projection onto this field's partition values is
    * safe under the manifest's numeric-first comparator. Truncate over
    * STRINGS is monotone in LEXICOGRAPHIC order, but the comparator
    * goes numeric when both sides parse as numbers — prefixes of
    * different lengths that both parse ('9' vs '10' under truncate[2])
    * then order numerically while Spark's row predicate on the string
    * column orders lexicographically, so a projected GtEq/LtEq could
    * prune a file holding a matching row. The comparator only goes
    * numeric when BOTH sides parse, so a projected literal that does
    * NOT parse as a number always compares lexicographically — safe.
    * Temporal transforms render fixed-width zero-padded digit strings
    * (equal-length digit strings order identically either way) and
    * integer truncates are genuinely numeric, so only
    * Truncate-on-string with a numeric-parsing projected value is
    * excluded. */
  private def rangeProjectionSafe(field: PartitionField, pv: String): Boolean =
    field.transform match {
      case Truncate(_) if field.sourceType == StringType =>
        pv.toLongOption.isEmpty && pv.toDoubleOption.isEmpty
      case _ => true
    }

  /** Project source-column predicates into partition-tuple predicates.
    * Sound by monotonicity (`Gt` relaxes to `GtEq` on the transformed
    * value — a row with `src > v` lives in a partition with
    * `t(src) >= t(v)`); `bucket` projects only point predicates.
    * Identity fields need no projection — the partition tuple already
    * carries the source name. Returned filters are ADDED to the
    * original conjuncts (the source filter keeps pruning on data-column
    * bounds; the projected one prunes on the partition value). */
  def projectFilters(spec: Seq[PartitionField],
      filters: Seq[IcebergLite.PartitionFilter]): Seq[IcebergLite.PartitionFilter] = {
    import IcebergLite.{Eq, Gt, GtEq, In, Lt, LtEq}
    def rangeVal(field: PartitionField, v: String): Option[String] =
      evalValue(field, v).filter(rangeProjectionSafe(field, _))
    for {
      f <- filters
      field <- spec
      if field.source == f.column && field.transform != Identity
      projected <- (f match {
        case Eq(_, v) => evalValue(field, v).map(Eq(field.name, _))
        case In(_, vs) =>
          val pvs = vs.map(evalValue(field, _))
          if (pvs.forall(_.isDefined)) Some(In(field.name, pvs.flatten.distinct))
          else None
        case Gt(_, v) if field.transform.monotone =>
          rangeVal(field, v).map(GtEq(field.name, _))
        case GtEq(_, v) if field.transform.monotone =>
          rangeVal(field, v).map(GtEq(field.name, _))
        case Lt(_, v) if field.transform.monotone =>
          rangeVal(field, v).map(LtEq(field.name, _))
        case LtEq(_, v) if field.transform.monotone =>
          rangeVal(field, v).map(LtEq(field.name, _))
        case _ => None
      }).toSeq
    } yield projected
  }

  // ---- spec persistence (metadata/partition-spec.json) ----
  // Layout carries every VERSION (real Iceberg's `partition-specs`
  // list): writes derive under the latest, reads project through all.

  private def fieldsJson(spec: Seq[PartitionField]): String =
    spec.map { f =>
      s"""{"name": "${f.name}", "source": "${f.source}", """ +
        s""""transform": "${f.transform.tag}", "source_type": "${f.sourceType.catalogString}"}"""
    }.mkString("[", ", ", "]")

  def specJson(spec: Seq[PartitionField]): String =
    specsJson(Seq(spec))

  def specsJson(versions: Seq[Seq[PartitionField]]): String =
    versions.zipWithIndex.map { case (s, i) =>
      s"""{"spec_id": $i, "fields": ${fieldsJson(s)}}"""
    }.mkString("""{"specs": [""", ", ", "]}")

  /** `DataType.fromDDL("timestamp")` resolves through the session's
    * `spark.sql.timestampType` (a suite flipping it to NTZ would
    * silently re-type every spec and re-hash every bucket) — the two
    * timestamp types parse explicitly instead. */
  private def parseType(ddl: String): DataType = ddl match {
    case "timestamp" => TimestampType
    case "timestamp_ntz" => TimestampNTZType
    case other => DataType.fromDDL(other)
  }

  private def parseFields(fs: Seq[org.json4s.JValue]): Seq[PartitionField] = {
    import org.json4s._
    implicit val formats: Formats = DefaultFormats
    fs.map { f =>
      PartitionField(
        (f \ "source").extract[String],
        parseTransform((f \ "transform").extract[String]),
        parseType((f \ "source_type").extract[String]))
    }
  }

  /** All spec versions, oldest first. Reads both the versioned layout
    * and the original single-spec `{"fields": [...]}` form. */
  def parseSpecs(json: org.json4s.JValue): Seq[Seq[PartitionField]] = {
    import org.json4s._
    (json \ "specs") match {
      case JArray(vs) => vs.map(v => (v \ "fields") match {
        case JArray(fs) => parseFields(fs)
        case _ => Nil
      })
      case _ => (json \ "fields") match {
        case JArray(fs) => Seq(parseFields(fs))
        case _ => Nil
      }
    }
  }
}
