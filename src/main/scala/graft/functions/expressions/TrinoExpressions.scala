package graft.functions.expressions

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.commons.math3.distribution.{BetaDistribution, TDistribution}
import org.apache.commons.math3.special.Erf
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the Trino-compatible surface the
  * reference declares but Spark lacks natively (SURVEY §2.8, reference
  * `src/planner/logical_expr.rs:270-536`). All are CodegenFallback —
  * they sit outside hot aggregation loops, so interpreter overhead is
  * acceptable; the arithmetic-heavy cosine kernel operates on Spark's
  * ArrayData primitives without boxing.
  */

/** COSINE_SIMILARITY(a, b) over array<float|double>. Declared-but-
  * unimplemented in the reference (filter.rs:3306-3308); first-class
  * here because the LLM-pipeline ANN operators build on it. */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  // zero-norm inputs yield NULL even for non-null children
  override def nullable: Boolean = true
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"cosine_similarity expects array<float|double>, got ${left.dataType}, ${right.dataType}")
  }

  private def elemIsFloat(e: Expression) =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val xf = elemIsFloat(left); val yf = elemIsFloat(right)
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) null else dot / (math.sqrt(nx) * math.sqrt(ny))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

/** HMAC_MD5 / HMAC_SHA1 / HMAC_SHA256 / HMAC_SHA512 (reference
  * filter.rs:4537+). Returns lowercase hex of the MAC. */
case class Hmac(left: Expression, right: Expression, algorithm: String)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(data: Any, key: Any): Any = {
    val mac = javax.crypto.Mac.getInstance(algorithm)
    mac.init(new javax.crypto.spec.SecretKeySpec(toBytes(key), algorithm))
    UTF8String.fromString(mac.doFinal(toBytes(data)).map("%02x".format(_)).mkString)
  }
  private def toBytes(v: Any): Array[Byte] = v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = s"hmac_${algorithm.replace("Hmac", "").toLowerCase}"
}

/** NORMALIZE(string[, form]) — Unicode normalization (reference NORMALIZE). */
case class NormalizeString(child: Expression, form: String)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    val f = java.text.Normalizer.Form.valueOf(form.toUpperCase)
    UTF8String.fromString(
      java.text.Normalizer.normalize(v.asInstanceOf[UTF8String].toString, f))
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "normalize"
}

/** WORD_STEM(word) — Porter stemmer (reference uses rust-stemmers). */
case class WordStem(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(graft.functions.Porter.stem(v.asInstanceOf[UTF8String].toString))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "word_stem"
}

/** HAMMING_DISTANCE(a, b) between equal-length strings. */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[UTF8String].toString
    val y = b.asInstanceOf[UTF8String].toString
    require(x.length == y.length, "hamming_distance requires equal-length strings")
    var d = 0L; var i = 0
    while (i < x.length) { if (x.charAt(i) != y.charAt(i)) d += 1; i += 1 }
    d
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "hamming_distance"
}

object Base32 {
  private val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
  private val lookup: Array[Int] = {
    val a = Array.fill(128)(-1)
    alphabet.zipWithIndex.foreach { case (c, i) => a(c) = i; a(c.toLower) = i }
    a
  }
  def encode(data: Array[Byte]): String = {
    val sb = new StringBuilder
    var buffer = 0L; var bits = 0
    data.foreach { b =>
      buffer = (buffer << 8) | (b & 0xff); bits += 8
      while (bits >= 5) { sb.append(alphabet((buffer >> (bits - 5)).toInt & 31)); bits -= 5 }
    }
    if (bits > 0) sb.append(alphabet((buffer << (5 - bits)).toInt & 31))
    while (sb.length % 8 != 0) sb.append('=')
    sb.toString
  }
  def decode(s: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream
    var buffer = 0L; var bits = 0
    s.foreach { c =>
      if (c != '=') {
        val v = if (c < 128) lookup(c) else -1
        require(v >= 0, s"invalid base32 character: $c")
        buffer = (buffer << 5) | v; bits += 5
        if (bits >= 8) { out.write((buffer >> (bits - 8)).toInt & 0xff); bits -= 8 }
      }
    }
    out.toByteArray
  }
}

/** TO_BASE32 / FROM_BASE32 (reference TO_BASE32/FROM_BASE32). */
case class ToBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UTF8String.fromString(Base32.encode(v match {
    case s: UTF8String => s.getBytes
    case b: Array[Byte] => b
  }))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_base32"
}

case class FromBase32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    Base32.decode(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_base32"
}

/** TO_BASE64URL / FROM_BASE64URL (RFC 4648 URL-safe alphabet). */
case class ToBase64Url(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = UTF8String.fromString(
    java.util.Base64.getUrlEncoder.encodeToString(v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }))
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_base64url"
}

case class FromBase64Url(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    java.util.Base64.getUrlDecoder.decode(v.asInstanceOf[UTF8String].toString)
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_base64url"
}

/** Big-endian int/long <-> varbinary (reference endian functions). */
case class ToBigEndian32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.allocate(4).putInt(v.asInstanceOf[Int]).array()
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_big_endian_32"
}

case class FromBigEndian32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]).getInt
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_big_endian_32"
}

case class ToBigEndian64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.allocate(8).putLong(v.asInstanceOf[Long]).array()
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_big_endian_64"
}

case class FromBigEndian64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]).getLong
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_big_endian_64"
}

/** IEEE 754 encodings (reference TO/FROM_IEEE754_32/64). */
case class ToIeee754_32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.allocate(4).putFloat(v.asInstanceOf[Float]).array()
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_ieee754_32"
}

case class FromIeee754_32(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = FloatType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]).getFloat
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_ieee754_32"
}

case class ToIeee754_64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BinaryType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.allocate(8).putDouble(v.asInstanceOf[Double]).array()
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "to_ieee754_64"
}

case class FromIeee754_64(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(v: Any): Any =
    ByteBuffer.wrap(v.asInstanceOf[Array[Byte]]).getDouble
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "from_ieee754_64"
}

/** IS_FINITE / IS_INFINITE (reference math const/special). */
case class IsFinite(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = v match {
    case d: Double => !d.isNaN && !d.isInfinite
    case f: Float => !f.isNaN && !f.isInfinite
    case _ => true
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "is_finite"
}

case class IsInfinite(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = BooleanType
  override def nullSafeEval(v: Any): Any = v match {
    case d: Double => d.isInfinite
    case f: Float => f.isInfinite
    case _ => false
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "is_infinite"
}

/** HUMAN_READABLE_SECONDS(double) — "2 days, 3 hours, 5 minutes". */
case class HumanReadableSeconds(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any = {
    var secs = math.round(v match {
      case d: Double => d
      case l: Long => l.toDouble
      case i: Int => i.toDouble
    })
    val neg = secs < 0
    if (neg) secs = -secs
    val units = Seq(
      ("week", 604800L), ("day", 86400L), ("hour", 3600L),
      ("minute", 60L), ("second", 1L))
    val parts = units.flatMap { case (name, span) =>
      val q = secs / span; secs %= span
      if (q > 0) Some(s"$q $name" + (if (q > 1) "s" else "")) else None
    }
    val out = if (parts.isEmpty) "0 seconds" else parts.mkString(", ")
    UTF8String.fromString(if (neg) "-" + out else out)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "human_readable_seconds"
}

/** PARSE_DATA_SIZE('2.3MB') → bytes (reference PARSE_DATA_SIZE). */
case class ParseDataSize(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = LongType
  private val units = Map(
    "B" -> 1L, "kB" -> (1L << 10), "MB" -> (1L << 20), "GB" -> (1L << 30),
    "TB" -> (1L << 40), "PB" -> (1L << 50), "EB" -> (1L << 60))
  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString.trim
    val idx = s.indexWhere(c => !c.isDigit && c != '.' && c != '-')
    require(idx > 0, s"invalid data size: $s")
    val num = s.substring(0, idx).toDouble
    val unit = s.substring(idx).trim
    val mult = units.getOrElse(unit, sys.error(s"unknown data size unit: $unit"))
    math.round(num * mult)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "parse_data_size"
}

/** MURMUR3(x) — canonical MurmurHash3 x86_32 (Austin Appleby, public
  * domain), seed 0, over UTF-8 (string) or raw (binary) bytes.
  * Declared by the reference as Int32 (logical_expr.rs:450-451) but
  * NotImplemented in its executor (filter.rs:4529-4534) — implemented
  * here, pinned by the independently-generated
  * data/hash_expected.parquet fixture (scripts/gen_hash_expected.py,
  * which asserts the algorithm's published verification vectors). */
case class Murmur3(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  // typed ANALYSIS error on murmur3(123) — the reference raises a
  // typed QueryError for its hash functions, not a runtime MatchError
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      // NullType: a bare murmur3(NULL) must stay NULL (the null
      // short-circuit), not an analysis error
      case StringType | BinaryType | NullType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"murmur3 expects string or binary, got $t")
    }
  override def nullSafeEval(v: Any): Any = {
    val bytes = v match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    val c1 = 0xcc9e2d51; val c2 = 0x1b873593
    var h = 0
    val n = bytes.length
    var i = 0
    while (i + 4 <= n) {
      var k = (bytes(i) & 0xff) | ((bytes(i + 1) & 0xff) << 8) |
        ((bytes(i + 2) & 0xff) << 16) | ((bytes(i + 3) & 0xff) << 24)
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2
      h ^= k; h = Integer.rotateLeft(h, 13); h = h * 5 + 0xe6546b64
      i += 4
    }
    var k = 0
    val rem = n & 3
    if (rem >= 3) k ^= (bytes(i + 2) & 0xff) << 16
    if (rem >= 2) k ^= (bytes(i + 1) & 0xff) << 8
    if (rem >= 1) {
      k ^= bytes(i) & 0xff
      k *= c1; k = Integer.rotateLeft(k, 15); k *= c2; h ^= k
    }
    h ^= n
    h ^= h >>> 16; h *= 0x85ebca6b; h ^= h >>> 13; h *= 0xc2b2ae35; h ^= h >>> 16
    h
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "murmur3"
}

/** PARSE_DURATION('5m') — Trino's duration grammar (decimal value +
  * unit ns|us|ms|s|m|h|d, optional space) as a day-time interval.
  * Declared by the reference as Interval(DayTime)
  * (logical_expr.rs:1267-1269) but NotImplemented (filter.rs:3999) —
  * implemented here at microsecond precision (DayTimeIntervalType's
  * native unit; nanoseconds round half up). */
case class ParseDuration(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = DayTimeIntervalType()
  private val Pat = """\s*(\d+(?:\.\d+)?)\s*(ns|us|ms|s|m|h|d)\s*""".r
  override def nullSafeEval(v: Any): Any =
    v.asInstanceOf[UTF8String].toString match {
      case Pat(num, unit) =>
        val perUnitMicros = unit match {
          case "ns" => BigDecimal(1) / 1000
          case "us" => BigDecimal(1)
          case "ms" => BigDecimal(1000)
          case "s" => BigDecimal(1000000L)
          case "m" => BigDecimal(60000000L)
          case "h" => BigDecimal(3600000000L)
          case "d" => BigDecimal(86400000000L)
        }
        (BigDecimal(num) * perUnitMicros)
          .setScale(0, scala.math.BigDecimal.RoundingMode.HALF_UP).toLongExact
      case other => throw new IllegalArgumentException(
        s"parse_duration: invalid duration literal '$other' " +
          "(expected <decimal><ns|us|ms|s|m|h|d>)")
    }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "parse_duration"
}

/** Trino TRUNCATE(x[, n]) — round toward zero. */
case class TruncateNumber(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(x: Any, n: Any): Any = {
    val d = x match { case v: Double => v; case v: Float => v.toDouble
      case v: Long => v.toDouble; case v: Int => v.toDouble }
    val digits = n.asInstanceOf[Int]
    val p = math.pow(10, digits)
    if (d >= 0) math.floor(d * p) / p else math.ceil(d * p) / p
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "truncate"
}

/** ISO week-based year (reference YEAR_OF_WEEK/YOW). */
case class YearOfWeek(child: Expression) extends UnaryExpression with CodegenFallback {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(v: Any): Any = {
    // days since epoch (DateType) or micros (TimestampNTZType)
    val epochDay: Long = child.dataType match {
      case DateType => v.asInstanceOf[Int].toLong
      case _ => Math.floorDiv(v.asInstanceOf[Long], 86400L * 1000000L)
    }
    java.time.LocalDate.ofEpochDay(epochDay)
      .get(java.time.temporal.IsoFields.WEEK_BASED_YEAR)
  }
  override protected def withNewChildInternal(c: Expression) = copy(child = c)
  override def prettyName: String = "year_of_week"
}

// ------------------------------------------------------- statistical CDFs

/** NORMAL_CDF(mean, sd, v) (reference filter.rs:3092+, via statrs;
  * here commons-math3, which ships with Spark). */
case class NormalCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(m: Any, sd: Any, v: Any): Any = {
    val mean = m.asInstanceOf[Double]; val s = sd.asInstanceOf[Double]
    0.5 * (1.0 + Erf.erf((v.asInstanceOf[Double] - mean) / (s * math.sqrt(2.0))))
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
  override def prettyName: String = "normal_cdf"
}

case class InverseNormalCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(m: Any, sd: Any, p: Any): Any = {
    val mean = m.asInstanceOf[Double]; val s = sd.asInstanceOf[Double]
    mean + s * math.sqrt(2.0) * Erf.erfInv(2.0 * p.asInstanceOf[Double] - 1.0)
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
  override def prettyName: String = "inverse_normal_cdf"
}

case class BetaCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, v: Any): Any =
    org.apache.commons.math3.special.Beta.regularizedBeta(
      v.asInstanceOf[Double], a.asInstanceOf[Double], b.asInstanceOf[Double])
  override protected def withNewChildrenInternal(x: Expression, y: Expression, z: Expression) =
    copy(first = x, second = y, third = z)
  override def prettyName: String = "beta_cdf"
}

case class InverseBetaCdf(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any, p: Any): Any =
    new BetaDistribution(null, a.asInstanceOf[Double], b.asInstanceOf[Double])
      .inverseCumulativeProbability(p.asInstanceOf[Double])
  override protected def withNewChildrenInternal(x: Expression, y: Expression, z: Expression) =
    copy(first = x, second = y, third = z)
  override def prettyName: String = "inverse_beta_cdf"
}

case class TCdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(df: Any, v: Any): Any =
    new TDistribution(null, df.asInstanceOf[Double])
      .cumulativeProbability(v.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "t_cdf"
}

case class TPdf(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(df: Any, v: Any): Any =
    new TDistribution(null, df.asInstanceOf[Double]).density(v.asInstanceOf[Double])
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "t_pdf"
}

/** WILSON_INTERVAL_LOWER/UPPER(successes, trials, z). */
case class WilsonInterval(first: Expression, second: Expression, third: Expression,
    upper: Boolean) extends TernaryExpression with CodegenFallback {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(s: Any, t: Any, zv: Any): Any = {
    val x = s.asInstanceOf[Long].toDouble
    val n = t.asInstanceOf[Long].toDouble
    val z = zv.asInstanceOf[Double]
    val p = x / n
    val z2 = z * z
    val denom = 1.0 + z2 / n
    val center = p + z2 / (2.0 * n)
    val spread = z * math.sqrt(p * (1.0 - p) / n + z2 / (4.0 * n * n))
    (if (upper) center + spread else center - spread) / denom
  }
  override protected def withNewChildrenInternal(a: Expression, b: Expression, c: Expression) =
    copy(first = a, second = b, third = c)
  override def prettyName: String =
    if (upper) "wilson_interval_upper" else "wilson_interval_lower"
}

// --------------------------------------------------- MySQL-pattern dates

/** Translates MySQL-style %-patterns (the reference's DATE_FORMAT /
  * DATE_PARSE dialect, chrono mapping in filter.rs date section) to
  * java.time patterns. */
object MySqlPattern {
  private val map = Seq(
    "%Y" -> "yyyy", "%y" -> "yy", "%m" -> "MM", "%c" -> "M",
    "%d" -> "dd", "%e" -> "d", "%H" -> "HH", "%k" -> "H",
    "%h" -> "hh", "%I" -> "hh", "%i" -> "mm", "%s" -> "ss", "%S" -> "ss",
    "%f" -> "SSSSSS", "%p" -> "a", "%W" -> "EEEE", "%a" -> "EEE",
    "%b" -> "MMM", "%M" -> "MMMM", "%j" -> "DDD", "%%" -> "%")
  def translate(fmt: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      if (fmt.charAt(i) == '%' && i + 1 < fmt.length) {
        val tok = fmt.substring(i, i + 2)
        map.find(_._1 == tok) match {
          case Some((_, rep)) => sb.append(rep); i += 2
          case None => sb.append(fmt.charAt(i + 1)); i += 2
        }
      } else {
        val c = fmt.charAt(i)
        // quote literal letters so java.time doesn't interpret them
        if (c.isLetter) sb.append('\'').append(c).append('\'') else sb.append(c)
        i += 1
      }
    }
    sb.toString
  }
}

/** DATE_FORMAT(ts, '%Y-%m-%d') with MySQL patterns. */
case class MySqlDateFormat(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = StringType
  override def nullSafeEval(ts: Any, fmt: Any): Any = {
    val pattern = MySqlPattern.translate(fmt.asInstanceOf[UTF8String].toString)
    val micros = ts.asInstanceOf[Long]
    val ldt = java.time.LocalDateTime.ofEpochSecond(
      Math.floorDiv(micros, 1000000L),
      (Math.floorMod(micros, 1000000L) * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    UTF8String.fromString(
      ldt.format(java.time.format.DateTimeFormatter.ofPattern(pattern, java.util.Locale.US)))
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "mysql_date_format"
}

/** DATE_PARSE('2024-01-01', '%Y-%m-%d') → timestamp_ntz. */
case class MySqlDateParse(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def dataType: DataType = TimestampNTZType
  override def nullSafeEval(s: Any, fmt: Any): Any = {
    val pattern = MySqlPattern.translate(fmt.asInstanceOf[UTF8String].toString)
    val fmtr = new java.time.format.DateTimeFormatterBuilder()
      .appendPattern(pattern)
      .parseDefaulting(java.time.temporal.ChronoField.HOUR_OF_DAY, 0)
      .parseDefaulting(java.time.temporal.ChronoField.MINUTE_OF_HOUR, 0)
      .parseDefaulting(java.time.temporal.ChronoField.SECOND_OF_MINUTE, 0)
      .toFormatter(java.util.Locale.US)
    val ldt = java.time.LocalDateTime.parse(s.asInstanceOf[UTF8String].toString, fmtr)
    ldt.toEpochSecond(java.time.ZoneOffset.UTC) * 1000000L + ldt.getNano / 1000L
  }
  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
  override def prettyName: String = "mysql_date_parse"
}
