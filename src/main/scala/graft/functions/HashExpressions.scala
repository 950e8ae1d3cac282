package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftx.Bridge
import org.apache.spark.sql.graftx.Types.AbstractDataType
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot paths of the text/vector
  * operators (SURVEY.md §4.2: "custom Expressions — optional, small";
  * preference order per the build brief: native Expression with
  * doGenCode > Scala UDF). All of these stay inside whole-stage
  * codegen — no boxing, no per-row allocation.
  */

/** Polynomial rolling hash over a string's UTF-8 bytes (h = h*31 + b,
  * wrapping i64). Used for content fingerprinting of documents — the
  * reference has no fingerprinting op; this is part of the
  * training-data-pipeline extension surface. */
case class RollingHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_hash64"

  override protected def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) { h = h * 31L + bytes(i); i += 1 }
    java.lang.Long.valueOf(h)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val i = ctx.freshName("i")
      s"""
        byte[] $bytes = $c.getBytes();
        long $h = 0L;
        for (int $i = 0; $i < $bytes.length; $i++) {
          $h = $h * 31L + (long) $bytes[$i];
        }
        ${ev.value} = $h;
      """
    })

  override protected def withNewChildInternal(c: Expression): RollingHash64 =
    copy(child = c)
}

/** SimHash over an array of pre-hashed tokens (array<long> → long):
  * bit b of the result is 1 iff the majority of token hashes have bit
  * b set. Near-duplicate texts differ in few tokens → simhashes within
  * small Hamming distance. Single pass over the array, 64 counters on
  * the stack. */
/** Content-defined chunk boundaries (the FastCDC/rsync discipline):
  * cut wherever the rolling hash of the trailing `window` codepoints
  * has its low `maskBits` bits zero — so boundaries derive from
  * CONTENT, not offsets, and an edit only re-chunks its own
  * neighborhood (every chunk before the edit keeps its hash — the
  * property that makes chunk-level dedup/storage incremental, vs
  * fixed windows where one inserted byte shifts every later chunk).
  * Expected chunk length ≈ 2^maskBits codepoints.
  *
  * Returns the 1-based END offsets of each chunk (final offset =
  * text length always included). Codepoint units and the t05 wrapping
  * 64-bit polynomial keep the oracle replayable in DuckDB HUGEINT SQL
  * (`ord(substr(…))` is codepoint-based, as is Spark's substring).
  * Size bounds, when needed, compose downstream: post-split long
  * chunks with fixed windows (t25), merge runts — both deterministic.
  * Pure map stage. */
case class CdcChunks(child: Expression, maskBits: Int, window: Int)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  require(maskBits >= 1 && maskBits <= 32, "maskBits in [1,32]")
  require(window >= 2, "window must be >= 2")
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_chunks"

  private val mask: Long = (1L << maskBits) - 1L
  // 31^window mod 2^64 — Long multiplication wraps, matching the
  // oracle's HUGEINT "% 2^64" reduction
  private val powW: Long = {
    var p = 1L; var i = 0
    while (i < window) { p *= 31L; i += 1 }
    p
  }

  override protected def nullSafeEval(v: Any): Any = {
    val cps = v.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    val ends = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    var i = 0
    while (i < n) {
      h = h * 31L + cps(i)
      if (i >= window) h -= cps(i - window) * powW
      // full window and masked bits zero → cut AFTER codepoint i
      if (i >= window - 1 && (h & mask) == 0L && i + 1 < n) ends += (i + 1)
      i += 1
    }
    if (n > 0) ends += n
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(ends.toArray)
  }

  override protected def withNewChildInternal(c: Expression): CdcChunks =
    copy(child = c)
}

case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = arr.getLong(i)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counters(b) += 1 else counters(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (counters(b) > 0) out |= (1L << b); b += 1 }
    java.lang.Long.valueOf(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counters = ctx.freshName("counters")
      val i = ctx.freshName("i")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val out = ctx.freshName("out")
      s"""
        int[] $counters = new int[64];
        for (int $i = 0; $i < $arr.numElements(); $i++) {
          if (!$arr.isNullAt($i)) {
            long $h = $arr.getLong($i);
            for (int $b = 0; $b < 64; $b++) {
              if ((($h >>> $b) & 1L) == 1L) $counters[$b]++; else $counters[$b]--;
            }
          }
        }
        long $out = 0L;
        for (int $b = 0; $b < 64; $b++) {
          if ($counters[$b] > 0) $out |= (1L << $b);
        }
        ${ev.value} = $out;
      """
    })

  override protected def withNewChildInternal(c: Expression): SimHash64 =
    copy(child = c)
}

/** Dot product of two numeric arrays (float or double) → double,
  * without materializing intermediate arrays (the built-in
  * `aggregate(zip_with(...))` composition allocates a zipped array per
  * row — this is the scale-path replacement for embedding similarity).
  * Mismatched lengths use the common prefix; null elements count as 0. */
case class VecDot(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (!x.isNullAt(i) && !y.isNullAt(i))
        acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
        int $n = Math.min($x.numElements(), $y.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          if (!$x.isNullAt($i) && !$y.isNullAt($i)) {
            $acc += (double) $x.getFloat($i) * (double) $y.getFloat($i);
          }
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): VecDot = copy(left = l, right = r)
}

/** MinHash signature in ONE pass over the shingle array (array<string>
  * → array<long>): each shingle is hashed once (xxHash64), then k
  * affine permutations `(a_i·h + b_i) mod P` update k running minima.
  * The pure-builtins composition (k × array_min(transform(...)))
  * re-evaluates the tokenize+hash pipeline per permutation — 64× the
  * work; this expression is the hot-path replacement (measured 46s →
  * sub-second on the sf0.01 documents table). */
case class MinHashSig(child: Expression, k: Int, seed: Long)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType)
  override def prettyName: String = "minhash_sig"

  private val P = 2147483647L // 2^31-1: keeps a*h+b < 2^62
  @transient private lazy val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(k)((1L + rnd.nextInt((P - 1).toInt).toLong,
      rnd.nextInt(P.toInt).toLong))
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h0 = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        val h = java.lang.Math.floorMod(h0, P)
        var j = 0
        while (j < k) {
          val v2 = (coeffs(j)._1 * h + coeffs(j)._2) % P
          if (v2 < mins(j)) mins(j) = v2
          j += 1
        }
      }
      i += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(mins)
  }

  override protected def withNewChildInternal(c: Expression): MinHashSig =
    copy(child = c)
}

/** Distinct word n-gram shingles of a normalized text in ONE pass
  * (string → array<string>): lowercase, collapse whitespace, split on
  * spaces, emit n-grams joined by a single space, distinct by first
  * occurrence; texts with < n tokens yield one whole-text shingle so
  * they stay joinable.
  *
  * Replaces the `transform(sequence(...), i => slice(tokens, i, n))`
  * composition, whose lambda re-evaluated the full
  * lower→regexp_replace→split pipeline once PER OUTPUT SHINGLE —
  * O(L²) regex work per document (measured 3.5s → ~0.2s for the sf0.1
  * documents table). Semantics match the DuckDB oracle expression
  * `regexp_split_to_array(trim(regexp_replace(lower(text),'\s+',' ','g')),' ')`
  * + n-gram concat + list_distinct. */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  require(n >= 1)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any = {
    val text = v.asInstanceOf[UTF8String].toLowerCase.toString
    // split on whitespace runs == collapse-then-split-on-space
    val toks = text.trim.split("\\s+", -1)
    val out = new java.util.LinkedHashSet[UTF8String]
    if (toks.length < n) {
      out.add(UTF8String.fromString(toks.mkString(" ")))
    } else {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i + n <= toks.length) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out.add(UTF8String.fromString(sb.toString))
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      out.toArray(Array.empty[AnyRef]))
  }

  override protected def withNewChildInternal(c: Expression): WordShingles =
    copy(child = c)
}

/** Shared single-pass text statistics used by [[TextStats]] and
  * [[LangId]]: ONE tokenization (lowercase → split on whitespace runs,
  * identical to [[WordShingles]]/the DuckDB oracles) producing all the
  * counts the quality/language operators need. The pure-builtins
  * compositions re-evaluate the lower→regex→split pipeline once per
  * metric (4-6× per row). */
private[functions] object TextStatsKernel {
  val stopDe: Set[String] = Set("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "zu", "auf")
  val stopEn: Set[String] = Set("the", "a", "of", "and", "in", "to", "is", "that", "it", "for")
  val stopEs: Set[String] = Set("el", "los", "las", "y", "es", "en", "una", "por", "con", "para")
  val stopFr: Set[String] = Set("le", "les", "et", "est", "dans", "une", "du", "pour", "sur", "au")

  /** (nTokens, nDistinct, sumLen, sDe, sEn, sEs, sFr, cjk) */
  def compute(v: UTF8String): Array[Long] = {
    val original = v.toString
    val toks = v.toLowerCase.toString.trim.split("\\s+", -1)
    val distinct = new java.util.HashSet[String]
    var sumLen = 0L
    var sDe = 0L; var sEn = 0L; var sEs = 0L; var sFr = 0L
    toks.foreach { t =>
      distinct.add(t)
      sumLen += t.length
      if (stopDe.contains(t)) sDe += 1
      if (stopEn.contains(t)) sEn += 1
      if (stopEs.contains(t)) sEs += 1
      if (stopFr.contains(t)) sFr += 1
    }
    var cjk = 0L
    var i = 0
    while (i < original.length) {
      val c = original.charAt(i)
      if (c >= 0x4e00 && c <= 0x9fff) cjk += 1
      i += 1
    }
    Array(toks.length.toLong, distinct.size.toLong, sumLen, sDe, sEn, sEs, sFr, cjk)
  }
}

/** All text-quality counts in one pass (string → struct<…:bigint>).
  * Ratios and rounding stay OUTSIDE in the query plan so the DuckDB
  * oracle semantics are composed from exact integers. */
case class TextStats(child: Expression)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = TextStats.schema
  override def prettyName: String = "text_stats"

  override protected def nullSafeEval(v: Any): Any = {
    val a = TextStatsKernel.compute(v.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(
      a(0), a(1), a(2), a(3), a(4), a(5), a(6), a(7))
  }

  override protected def withNewChildInternal(c: Expression): TextStats =
    copy(child = c)
}

object TextStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("sum_token_len", LongType, nullable = false),
    StructField("s_de", LongType, nullable = false),
    StructField("s_en", LongType, nullable = false),
    StructField("s_es", LongType, nullable = false),
    StructField("s_fr", LongType, nullable = false),
    StructField("cjk", LongType, nullable = false)))
}

/** All repetition-signal counts in ONE tokenization pass: total and
  * distinct counts of tokens, 2-grams, and 3-grams (Gopher-style
  * duplicate-fraction inputs). The pure-builtins composition
  * (split + transform + array_distinct, referenced once per ratio)
  * re-evaluates the tokenize/n-gram pipeline per reference — HOF
  * subtrees are excluded from Spark's subexpression elimination —
  * measured ~5× slower at sf0.1. Ratios/rounding stay OUTSIDE in the
  * plan so the DuckDB oracle composes from exact integers. */
private[functions] object RepStatsKernel {
  /** (nTok, dTok, n2g, d2g, n3g, d3g) — token/gram definitions match
    * TextFunctions.tokens / ngramList (lowercase, \s+ split; grams
    * joined by single spaces; <n tokens → zero grams). */
  def compute(v: UTF8String): Array[Long] = {
    val toks = v.toLowerCase.toString.trim.split("\\s+", -1)
    val n = toks.length
    val dTok = new java.util.HashSet[String]
    var i = 0
    while (i < n) { dTok.add(toks(i)); i += 1 }
    val d2 = new java.util.HashSet[String]
    i = 0
    while (i < n - 1) { d2.add(toks(i) + " " + toks(i + 1)); i += 1 }
    val d3 = new java.util.HashSet[String]
    i = 0
    while (i < n - 2) { d3.add(toks(i) + " " + toks(i + 1) + " " + toks(i + 2)); i += 1 }
    Array(n.toLong, dTok.size.toLong,
      math.max(0, n - 1).toLong, d2.size.toLong,
      math.max(0, n - 2).toLong, d3.size.toLong)
  }
}

case class RepStats(child: Expression)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = RepStats.schema
  override def prettyName: String = "rep_stats"

  override protected def nullSafeEval(v: Any): Any = {
    val a = RepStatsKernel.compute(v.asInstanceOf[UTF8String])
    org.apache.spark.sql.catalyst.InternalRow(a(0), a(1), a(2), a(3), a(4), a(5))
  }

  override protected def withNewChildInternal(c: Expression): RepStats =
    copy(child = c)
}

object RepStats {
  val schema: StructType = StructType(Seq(
    StructField("n_tokens", LongType, nullable = false),
    StructField("d_tokens", LongType, nullable = false),
    StructField("n_2grams", LongType, nullable = false),
    StructField("d_2grams", LongType, nullable = false),
    StructField("n_3grams", LongType, nullable = false),
    StructField("d_3grams", LongType, nullable = false)))
}

/** Heuristic language ID in one pass (same decision procedure as the
  * Column composition in TextFunctions.langId and the t04 DuckDB
  * oracle: CJK char ratio → 'zh'; best stopword-profile hit count with
  * alphabetical tiebreak; 'und' when no profile hits). */
case class LangId(child: Expression)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  override protected def nullSafeEval(v: Any): Any = {
    val a = TextStatsKernel.compute(v.asInstanceOf[UTF8String])
    val (n, sDe, sEn, sEs, sFr, cjk) = (a(0), a(3), a(4), a(5), a(6), a(7))
    val best = math.max(math.max(sDe, sEn), math.max(sEs, sFr))
    val lang =
      if (cjk * 4 >= n) "zh"
      else if (best == 0) "und"
      else if (sDe == best) "de"
      else if (sEn == best) "en"
      else if (sEs == best) "es"
      else "fr"
    UTF8String.fromString(lang)
  }

  override protected def withNewChildInternal(c: Expression): LangId =
    copy(child = c)
}

/** Random-hyperplane LSH band values for cosine similarity in ONE
  * pass (array<float> → array<long>, one value per band): bit j of
  * band i is sign(v · r_{i·rows+j}) for seeded Gaussian hyperplanes,
  * packed into a `rowsPerBand`-bit value.
  *
  * Wide bands are the point: with b-bit bands a random pair collides
  * with probability ~2^-b per band, so candidate volume is
  * bands·n²/2^b — the literal-array composition this replaces was
  * limited to tiny nbits (every plane inlined into the plan) and its
  * 2-bit bands made the bucket self-join effectively O(n²) (OOM at
  * 20k vectors, measured). Planes are regenerated from the seed per
  * executor — nothing big is serialized. */
case class HyperplaneBands(
    child: Expression, dim: Int, bands: Int, rowsPerBand: Int, seed: Long)
    extends UnaryExpression with codegen.CodegenFallback
    with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(FloatType))
  require(rowsPerBand >= 1 && rowsPerBand <= 62 && bands >= 1)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "hyperplane_bands"

  @transient private lazy val planes: Array[Array[Float]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(bands * rowsPerBand)(Array.fill(dim)(rnd.nextGaussian().toFloat))
  }

  override protected def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = math.min(arr.numElements(), dim)
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var value = 0L
      var j = 0
      while (j < rowsPerBand) {
        val p = planes(b * rowsPerBand + j)
        var acc = 0.0
        var i = 0
        while (i < n) {
          if (!arr.isNullAt(i)) acc += arr.getFloat(i).toDouble * p(i)
          i += 1
        }
        if (acc > 0.0) value |= (1L << j)
        j += 1
      }
      out(b) = value
      b += 1
    }
    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(out)
  }

  override protected def withNewChildInternal(c: Expression): HyperplaneBands =
    copy(child = c)
}

/** Unicode NFC normalization (java.text.Normalizer) — canonical
  * composition so visually-identical strings (é vs e+◌́) hash and
  * dedup identically. Spark has no normalization builtin; this stays
  * inside whole-stage codegen (the generated code calls the JDK
  * normalizer directly, no boxing beyond the String the JDK API
  * requires). Matches DuckDB's `nfc_normalize` for the oracles. */
case class NfcNormalize(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = StringType
  override def prettyName: String = "nfc_normalize"

  override protected def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[UTF8String].toString
    UTF8String.fromString(
      java.text.Normalizer.normalize(s, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
        ${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
          java.text.Normalizer.normalize($c.toString(),
            java.text.Normalizer.Form.NFC));
      """)

  override protected def withNewChildInternal(c: Expression): NfcNormalize =
    copy(child = c)
}

/** Column-API entry points for the native expressions. */
object HashFunctions {
  import Bridge.{column => asCol, expression => asExpr}
  def rolling_hash64(c: Column): Column = asCol(RollingHash64(asExpr(c)))
  def cdc_chunks(c: Column, maskBits: Int, window: Int): Column =
    asCol(CdcChunks(asExpr(c), maskBits, window))
  def nfc_normalize(c: Column): Column = asCol(NfcNormalize(asExpr(c)))
  def simhash64(hashedTokens: Column): Column = asCol(SimHash64(asExpr(hashedTokens)))
  def vec_dot(a: Column, b: Column): Column = asCol(VecDot(asExpr(a), asExpr(b)))
  def minhash_sig(shingles: Column, k: Int, seed: Long): Column =
    asCol(MinHashSig(asExpr(shingles), k, seed))
  def word_shingles(text: Column, n: Int): Column =
    asCol(WordShingles(asExpr(text), n))
  def text_stats(text: Column): Column = asCol(TextStats(asExpr(text)))
  def rep_stats(text: Column): Column = asCol(RepStats(asExpr(text)))
  def lang_id(text: Column): Column = asCol(LangId(asExpr(text)))
  def hyperplane_bands(vec: Column, dim: Int, bands: Int, rowsPerBand: Int,
      seed: Long): Column =
    asCol(HyperplaneBands(asExpr(vec), dim, bands, rowsPerBand, seed))
  /** Per-group bounded-heap top-k aggregate; `s` is a struct whose
    * FIRST field is the LONG composite ordering key. */
  def top_k_rows(s: Column, k: Int): Column =
    asCol(TopKRows(asExpr(s), k).toAggregateExpression())
}
