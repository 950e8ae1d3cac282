package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.functions.HashFunctions._
import graft.operators.AsofJoin

/** Property-based tests (SURVEY §5 "then ScalaCheck property tests"):
  * native expressions against straightforward Scala reference
  * implementations, and the as-of join against a per-row oracle.
  * Trial counts are kept small — each trial runs a Spark job. */
object PropertiesSpec extends Properties("graft") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private lazy val spark = SparkTestBase.session
  import scala.jdk.CollectionConverters._

  // --- WordShingles ≡ reference implementation ----------------------

  private def refShingles(text: String, n: Int): Seq[String] = {
    val toks = text.toLowerCase.trim.split("\\s+", -1).toSeq
    if (toks.length < n) Seq(toks.mkString(" "))
    else toks.sliding(n).map(_.mkString(" ")).toSeq.distinct
  }

  private val genText: Gen[String] = for {
    words <- Gen.listOfN(
      12, Gen.oneOf("the", "cat", "sat", "on", "a", "mat", "Dog", "RUNS", "42"))
    seps <- Gen.listOfN(12, Gen.oneOf(" ", "  ", "\t", " \n "))
  } yield words.zip(seps).map { case (w, s) => w + s }.mkString

  property("wordShingles matches the reference implementation") =
    Prop.forAll(genText, Gen.choose(1, 4)) { (text, n) =>
      import spark.implicits._
      val got = Seq(text).toDF("t")
        .select(word_shingles(col("t"), n).as("sh"))
        .head().getSeq[String](0)
      got == refShingles(text, n)
    }

  // --- MinHashSig: shape + permutation invariance -------------------

  private val genShingleSet: Gen[List[String]] =
    Gen.choose(1, 30).flatMap(k =>
      Gen.listOfN(k, Gen.alphaNumStr.suchThat(_.nonEmpty)))

  property("minhash signature has length k, is order-invariant and deterministic") =
    Prop.forAll(genShingleSet) { shingles =>
      import spark.implicits._
      def sig(xs: Seq[String]): Seq[Long] =
        Seq(xs).toDF("sh")
          .select(minhash_sig(col("sh"), 16, 42L).as("sig"))
          .head().getSeq[Long](0)
      val a = sig(shingles)
      val b = sig(scala.util.Random.shuffle(shingles))
      a.length == 16 && a == b
    }

  // --- VecDot ≡ plain double accumulation, symmetric ----------------

  private val genVec: Gen[List[Float]] =
    Gen.listOfN(8, Gen.choose(-5.0f, 5.0f))

  property("vec_dot matches sequential accumulation and is symmetric") =
    Prop.forAll(genVec, genVec) { (x, y) =>
      import spark.implicits._
      def dot(a: Seq[Float], b: Seq[Float]): Double =
        Seq((a, b)).toDF("a", "b")
          .select(vec_dot(col("a"), col("b")).as("d"))
          .head().getDouble(0)
      val expected = x.zip(y).foldLeft(0.0) { case (acc, (a, b)) =>
        acc + a.toDouble * b.toDouble
      }
      math.abs(dot(x, y) - expected) < 1e-9 &&
        math.abs(dot(x, y) - dot(y, x)) < 1e-12
    }

  // --- AsofJoin ≡ per-row oracle ------------------------------------

  private val genEvents: Gen[(List[(Long, Long)], List[(Long, Long, Double)])] =
    for {
      nL <- Gen.choose(1, 25)
      nR <- Gen.choose(0, 25)
      lefts <- Gen.listOfN(nL, Gen.zip(Gen.choose(0L, 3L), Gen.choose(0L, 50L)))
      rights <- Gen.listOfN(nR, Gen.zip(
        Gen.choose(0L, 3L), Gen.choose(0L, 50L), Gen.choose(0.0, 9.0)))
    } yield (lefts, rights)

  property("asofLeft matches the latest-at-or-before oracle") =
    Prop.forAll(genEvents) { case (lefts, rights) =>
      import spark.implicits._
      // contract: right side unique per (key, ts) — dedupe by max value
      val rightDedup = rights.groupBy(r => (r._1, r._2)).map {
        case ((k, t), rs) => (k, t, rs.map(_._3).max)
      }.toSeq
      val leftDf = lefts.zipWithIndex
        .map { case ((k, t), i) => (i.toLong, k, t) }
        .toDF("row_id", "k", "ts")
      val rightDf = rightDedup.toDF("k", "rts", "v")
      val got = AsofJoin.asofLeft(leftDf, rightDf, Seq("k"), "ts", "rts",
          Seq("rts", "v"))
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(4)) None else Some((r.getLong(3), r.getDouble(4)))))
        .toMap
      lefts.zipWithIndex.forall { case ((k, t), i) =>
        val expected = rightDedup.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(r => (r._2, r._3))
        got(i.toLong) == expected
      }
    }

  // --- Pack.packBins ≡ sequential prefix-sum oracle -----------------

  private val genPackInput: Gen[(Seq[(Long, Long)], Long)] = for {
    n <- Gen.choose(1, 120)
    weights <- Gen.listOfN(n, Gen.choose(0L, 500L))
    capacity <- Gen.choose(1L, 700L)
    // non-contiguous, unordered ids
    ids <- Gen.pick(n, 0L until 1000L)
  } yield (ids.toSeq.zip(weights), capacity)

  property("packBins matches the sequential prefix-sum oracle for any weights/capacity") =
    Prop.forAll(genPackInput) { case (rows, capacity) =>
      import spark.implicits._
      val df = spark.createDataset(scala.util.Random.shuffle(rows))
        .repartition(7).toDF("id", "w")
      val got = graft.operators.Pack.packBins(df, "id", "w", capacity)
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
      var running = 0L
      rows.sortBy(_._1).forall { case (id, w) =>
        val bin = running / capacity
        running += w
        got(id) == (w, bin)
      }
    }

  // --- UrlOps.canonicalizeUrl: idempotence --------------------------

  private val genUrl: Gen[String] = for {
    scheme <- Gen.oneOf("http", "HTTPS", "https")
    www <- Gen.oneOf("", "www.", "WWW.")
    host <- Gen.oneOf("Example.COM", "a.b.org", "x.io")
    port <- Gen.oneOf("", ":443", ":80", ":8080")
    path <- Gen.oneOf("", "/", "/P/Q", "/p/")
    query <- Gen.oneOf("", "?a=1", "?utm_source=x", "?utm_a=1&b=2&utm_c=3",
      "?b=2&utm_x=9")
    frag <- Gen.oneOf("", "#f", "#Sec2")
  } yield s"$scheme://$www$host$port$path$query$frag"

  property("canonicalizeUrl is idempotent (canon ∘ canon = canon)") =
    Prop.forAll(Gen.listOfN(8, genUrl)) { urls =>
      import spark.implicits._
      import graft.operators.UrlOps.canonicalizeUrl
      val df = urls.toDF("u")
      val once = df.select(canonicalizeUrl(col("u")).as("c"))
        .collect().map(_.getString(0)).toSeq
      val twice = df.select(
          canonicalizeUrl(canonicalizeUrl(col("u"))).as("c"))
        .collect().map(_.getString(0)).toSeq
      once == twice
    }

  // --- SqlDialect.translate: idempotent + pass-through --------------

  // Statement-level rewrites (PIVOT/UNPIVOT/ASOF) are regex-driven;
  // the properties that keep them safe are (a) translating already-
  // translated text is a no-op, and (b) text without dialect tokens
  // is untouched.
  private val genDialectSql: Gen[String] = Gen.oneOf(
    Gen.const("SELECT a, b FROM t WHERE a > 1 ORDER BY b"),
    for {
      tbl <- Gen.oneOf("t", "sch.t")
      dir <- Gen.oneOf(">=", "<=", ">", "<")
      lkw <- Gen.oneOf("ASOF JOIN", "ASOF LEFT JOIN", "LEFT ASOF JOIN")
    } yield s"SELECT * FROM l $lkw $tbl r ON l.k = r.k AND l.ts $dir r.ts",
    for {
      vals <- Gen.someOf(Seq("'a'", "'b'", "'c'")).map(_.toSeq)
        if vals.nonEmpty
    } yield s"PIVOT t ON c IN (${vals.mkString(", ")}) USING sum(x) GROUP BY g",
    Gen.const("UNPIVOT w ON a, b INTO NAME m VALUE v"))

  property("SqlDialect.translate is idempotent on dialect statements") =
    Prop.forAll(genDialectSql) { sql =>
      import graft.engine.SqlDialect
      val once = SqlDialect.translate(sql)
      SqlDialect.translate(once) == once
    }

  property("plain ANSI text passes through translate unchanged") =
    Prop.forAll(Gen.oneOf(
      "SELECT l_returnflag, sum(l_quantity) FROM lineitem GROUP BY 1",
      "SELECT a FROM t JOIN u ON t.id = u.id WHERE a IS NOT NULL",
      "SELECT count(*) FROM events ORDER BY 1 LIMIT 5")) { sql =>
      graft.engine.SqlDialect.translate(sql) == sql
    }

  // --- Layout.mortonInterleave: bijective on the quantized grid -----

  property("mortonInterleave is a bijection on [0,2^b)² and bounded by 4^b") =
    Prop.forAll(Gen.choose(2, 5)) { bits =>
      import spark.implicits._
      val n = 1 << bits
      val grid = (for { a <- 0 until n; b <- 0 until n }
        yield (a.toLong, b.toLong)).toDF("a", "b")
      val zs = grid.select(
          graft.operators.Layout.mortonInterleave(col("a"), col("b"), bits))
        .collect().map(_.getLong(0))
      zs.distinct.length == n * n && zs.forall(z => z >= 0 && z < n.toLong * n)
    }
}
