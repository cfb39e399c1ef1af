package graft

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Porter
import graft.functions.expressions.{Base32, MySqlPattern, StableHash}

/** Property-based tests for the pure kernels (SURVEY §5 — the reference
  * has no property tests; ScalaCheck is available here). */
class PropertySpec extends AnyFunSuite {

  // scalatestplus bridge isn't in the offline cache — drive Gen directly
  private def forAll[T](g: Gen[T], n: Int = 300)(check: T => Unit): Unit =
    Iterator.continually(g.sample).flatten.take(n).foreach(check)

  test("SqlText.splitQuoted reconstructs any input verbatim (both dialects)") {
    // the shared quote-walker behind the parser rewrites AND the golden
    // oracle redirect: segmentation must be lossless however quotes,
    // escapes, and garbage interleave
    val sqlish = Gen.listOf(Gen.frequency(
      8 -> Gen.alphaNumChar, 3 -> Gen.const('\''), 2 -> Gen.const('"'),
      2 -> Gen.const('\\'), 2 -> Gen.oneOf(' ', ',', '(', ')', '%'))).map(_.mkString)
    forAll(sqlish) { s =>
      assert(SqlText.splitQuoted(s, backslashInSingleQuotes = true).mkString == s)
      assert(SqlText.splitQuoted(s, backslashInSingleQuotes = false).mkString == s)
      // identity code-mapping is the identity overall
      assert(SqlText.mapCode(s, backslashInSingleQuotes = true)(identity) == s)
    }
  }

  test("SqlText quoted segments carry every quote char (code is quote-free)") {
    val sqlish = Gen.listOf(Gen.frequency(
      6 -> Gen.alphaNumChar, 3 -> Gen.const('\''), 2 -> Gen.const('"'))).map(_.mkString)
    forAll(sqlish) { s =>
      SqlText.splitQuoted(s, backslashInSingleQuotes = false).zipWithIndex.foreach {
        case (seg, i) if i % 2 == 0 =>
          assert(!seg.exists(c => c == '\'' || c == '"'), s"code segment quoted: $seg in $s")
        case _ => ()
      }
    }
  }

  test("base32 roundtrips arbitrary byte arrays") {
    forAll(Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue))) { bytes =>
      val arr = bytes.toArray
      assert(Base32.decode(Base32.encode(arr)).sameElements(arr))
    }
  }

  test("base32 output alphabet and padding shape") {
    forAll(Gen.alphaNumStr) { s =>
      val enc = Base32.encode(s.getBytes("UTF-8"))
      assert(enc.length % 8 == 0)
      assert(enc.forall(c => "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567=".contains(c)))
    }
  }

  test("porter stemmer is total, lowercase, never longer than input") {
    forAll(Gen.alphaLowerStr.suchThat(_.nonEmpty)) { w =>
      val s = Porter.stem(w)
      assert(s.nonEmpty)
      assert(s.length <= math.max(w.length, 3))
      assert(s == s.toLowerCase)
    }
  }

  test("stable hash is deterministic and seed-sensitive") {
    forAll(Gen.alphaNumStr.suchThat(_.nonEmpty)) { s =>
      assert(StableHash.fnv1a64(s) == StableHash.fnv1a64(s))
      assert(StableHash.seeded(s, 1L) == StableHash.seeded(s, 1L))
      assert(StableHash.seeded(s, 1L) != StableHash.seeded(s, 2L))
    }
  }

  test("mysql pattern translation quotes literal letters") {
    // java.time must not interpret stray letters: 'T' stays literal
    assert(MySqlPattern.translate("%Y-%m-%dT%H") == "yyyy-MM-dd'T'HH")
    assert(MySqlPattern.translate("%d/%m/%Y") == "dd/MM/yyyy")
    assert(MySqlPattern.translate("%%") == "%")
  }

  test("ngrams/combinations/contains_sequence agree with Scala reference semantics") {
    val spark = TestSpark.spark
    Engine.registerDir(spark, TestSpark.sf0001) // TrinoFunctions.register
    def one(sql: String) = spark.sql(s"SELECT $sql AS v").collect()(0)
    forAll(Gen.zip(Gen.nonEmptyListOf(Gen.choose(0, 9)), Gen.choose(1, 4)), n = 25) {
      case (xs, n) =>
        val arr = xs.mkString("array(", ",", ")")
        val ng = one(s"ngrams($arr, $n)").getSeq[scala.collection.Seq[Int]](0)
        val expNg = if (xs.length <= n) Seq(xs) else xs.sliding(n).toSeq
        assert(ng.map(_.toList) == expNg.map(_.toList))
        val cb = one(s"combinations($arr, $n)").getSeq[scala.collection.Seq[Int]](0)
        val expCb = xs.indices.combinations(n).map(ix => ix.map(xs).toList).toList
        assert(cb.map(_.toList) == expCb)
        // every contiguous slice is contained; a 10-free probe is not
        val s0 = xs.length / 2
        val sub = xs.slice(s0, s0 + math.min(2, xs.length - s0))
        if (sub.nonEmpty) {
          val subArr = sub.mkString("array(", ",", ")")
          assert(one(s"contains_sequence($arr, $subArr)").getBoolean(0))
        }
        assert(!one(s"contains_sequence($arr, array(10))").getBoolean(0))
    }
  }

  test("statistical CDFs: symmetry, monotonicity, inverse roundtrips (property)") {
    // The normal/beta CDF bucket is the one DuckDB-inexpressible
    // no_oracle row (no erf) — so pin it with the mathematical
    // IDENTITIES any correct implementation must satisfy, over random
    // parameters, on top of FunctionSpec's scipy-checked point values.
    import org.apache.spark.sql.catalyst.expressions.Literal
    import graft.functions.expressions.{NormalCdf, InverseNormalCdf, BetaCdf, InverseBetaCdf, TCdf}
    def nCdf(m: Double, s: Double, x: Double) =
      NormalCdf(Literal(m), Literal(s), Literal(x)).eval(null).asInstanceOf[Double]
    def nInv(m: Double, s: Double, p: Double) =
      InverseNormalCdf(Literal(m), Literal(s), Literal(p)).eval(null).asInstanceOf[Double]
    def bCdf(a: Double, b: Double, x: Double) =
      BetaCdf(Literal(a), Literal(b), Literal(x)).eval(null).asInstanceOf[Double]
    def bInv(a: Double, b: Double, p: Double) =
      InverseBetaCdf(Literal(a), Literal(b), Literal(p)).eval(null).asInstanceOf[Double]
    def tCdf(df: Double, x: Double) = // expression order: (df, x)
      TCdf(Literal(df), Literal(x)).eval(null).asInstanceOf[Double]

    val normal = for {
      m <- Gen.choose(-100.0, 100.0); s <- Gen.choose(0.1, 50.0)
      z <- Gen.choose(-4.0, 4.0)
    } yield (m, s, z)
    forAll(normal, n = 200) { case (m, s, z) =>
      val v = m + z * s
      // symmetry about the mean: F(m+d) + F(m-d) = 1
      assert(math.abs(nCdf(m, s, m + z * s) + nCdf(m, s, m - z * s) - 1.0) < 1e-12)
      // monotone nondecreasing
      assert(nCdf(m, s, v) <= nCdf(m, s, v + s / 10) + 1e-15)
      // inverse roundtrip (|z| <= 4 keeps p away from the erfInv poles)
      assert(math.abs(nInv(m, s, nCdf(m, s, v)) - v) <= 1e-6 * math.max(1.0, math.abs(v)))
    }

    val beta = for {
      a <- Gen.choose(0.5, 20.0); b <- Gen.choose(0.5, 20.0)
      x <- Gen.choose(0.01, 0.99)
    } yield (a, b, x)
    forAll(beta, n = 200) { case (a, b, x) =>
      // reflection identity: I_x(a,b) = 1 - I_(1-x)(b,a)
      assert(math.abs(bCdf(a, b, x) - (1.0 - bCdf(b, a, 1.0 - x))) < 1e-10)
      assert(bCdf(a, b, x) <= bCdf(a, b, math.min(0.999, x + 0.005)) + 1e-12)
      val p = bCdf(a, b, x)
      if (p > 1e-9 && p < 1.0 - 1e-9)
        assert(math.abs(bInv(a, b, p) - x) <= 1e-6)
    }

    val t = for { df <- Gen.choose(1.0, 50.0); x <- Gen.choose(0.0, 5.0) } yield (df, x)
    forAll(t, n = 100) { case (df, x) =>
      // symmetry: F(-x) = 1 - F(x)
      assert(math.abs(tCdf(df, -x) + tCdf(df, x) - 1.0) < 1e-12)
    }
    // t converges to standard normal as df grows
    assert(math.abs(tCdf(1e6, 1.5) - nCdf(0.0, 1.0, 1.5)) < 1e-4)
  }

  test("minhash signature similarity estimates jaccard (deterministic fixture)") {
    // two sets with known jaccard 0.5: {a..f} vs {d..i} -> 3/9 = 1/3
    val a = (0 until 60).map(i => s"tok$i").toSet
    val b = (30 until 90).map(i => s"tok$i").toSet
    val trueJ = (a intersect b).size.toDouble / (a union b).size // = 30/90
    val k = 128
    def sig(s: Set[String]): Array[Long] =
      Array.tabulate(k)(j => s.map(x => StableHash.seeded(x, j.toLong)).min)
    val (sa, sb) = (sig(a), sig(b))
    val est = sa.zip(sb).count { case (x, y) => x == y }.toDouble / k
    assert(math.abs(est - trueJ) < 0.15, s"est=$est true=$trueJ")
  }
}
