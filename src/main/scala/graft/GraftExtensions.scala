package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions._

/** SparkSessionExtensions entry point: injects the native Catalyst
  * expressions into the SQL function registry so they are callable
  * from SQL text — not just the Column API:
  *
  * {{{
  *   SparkSession.builder()
  *     .config("spark.sql.extensions", "graft.GraftExtensions")
  *     ...
  *   spark.sql("SELECT word_shingles(text, 3) FROM docs")
  * }}}
  *
  * Sessions built WITHOUT the config (embedding the library in an
  * existing application/session) get the same registry via
  * [[GraftExtensions.ensureRegistered]] — `Invoke` calls it before
  * running handler SQL, so YAML pipelines can use the functions
  * regardless of how the session was constructed.
  *
  * Registered: word_shingles(text, n), minhash_sig(shingles, k, seed),
  * simhash64(hashedTokens), rolling_hash64(text), cdc_chunks(text, maskBits, window), nfc_normalize(text),
  * vec_dot(a, b), text_stats(text), rep_stats(text), lang_id(text),
  * duck_extract(col, key),
  * hyperplane_bands(vec, dim, bands, rowsPerBand, seed),
  * html_extract(html).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.functions.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))
    }
}

object GraftExtensions {

  private def intLit(e: Expression, what: String): Int = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longLit(e: Expression, what: String): Long = e match {
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Long, _) => v
    case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v.toLong
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  /** (name, usage, builder) for every native SQL-callable expression —
    * the single source for both the extensions path and
    * [[ensureRegistered]]. */
  val functions: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("word_shingles", "word_shingles(text, n)", (args: Seq[Expression]) => {
      require(args.length == 2, "word_shingles(text, n)")
      WordShingles(args.head, intLit(args(1), "n"))
    }),
    ("minhash_sig", "minhash_sig(shingles, k, seed)", (args: Seq[Expression]) => {
      require(args.length == 3, "minhash_sig(shingles, k, seed)")
      MinHashSig(args.head, intLit(args(1), "k"), longLit(args(2), "seed"))
    }),
    ("simhash64", "simhash64(hashedTokens)", (args: Seq[Expression]) => {
      require(args.length == 1, "simhash64(hashedTokens)")
      SimHash64(args.head)
    }),
    ("rolling_hash64", "rolling_hash64(text)", (args: Seq[Expression]) => {
      require(args.length == 1, "rolling_hash64(text)")
      RollingHash64(args.head)
    }),
    ("cdc_chunks", "cdc_chunks(text, maskBits, window)",
      (args: Seq[Expression]) => {
        require(args.length == 3, "cdc_chunks(text, maskBits, window)")
        CdcChunks(args.head, intLit(args(1), "maskBits"),
          intLit(args(2), "window"))
      }),
    ("nfc_normalize", "nfc_normalize(text)", (args: Seq[Expression]) => {
      require(args.length == 1, "nfc_normalize(text)")
      NfcNormalize(args.head)
    }),
    ("vec_dot", "vec_dot(a, b)", (args: Seq[Expression]) => {
      require(args.length == 2, "vec_dot(a, b)")
      VecDot(args.head, args(1))
    }),
    ("text_stats", "text_stats(text)", (args: Seq[Expression]) => {
      require(args.length == 1, "text_stats(text)")
      TextStats(args.head)
    }),
    ("rep_stats", "rep_stats(text)", (args: Seq[Expression]) => {
      require(args.length == 1, "rep_stats(text)")
      RepStats(args.head)
    }),
    ("lang_id", "lang_id(text)", (args: Seq[Expression]) => {
      require(args.length == 1, "lang_id(text)")
      LangId(args.head)
    }),
    ("duck_extract", "duck_extract(col, 'key')", (args: Seq[Expression]) => {
      require(args.length == 2, "duck_extract(col, 'key')")
      DuckArrowExtract(args.head, args(1))
    }),
    ("hyperplane_bands", "hyperplane_bands(vec, dim, bands, rowsPerBand, seed)",
      (args: Seq[Expression]) => {
        require(args.length == 5,
          "hyperplane_bands(vec, dim, bands, rowsPerBand, seed)")
        HyperplaneBands(args.head, intLit(args(1), "dim"), intLit(args(2), "bands"),
          intLit(args(3), "rowsPerBand"), longLit(args(4), "seed"))
      }),
    // composed-expression function (not a native Expression): expands
    // to Html.extractText's strip/decode chain at resolution time, so
    // handler SQL gets the crawl-ingestion step with zero plumbing —
    // and the SQL path can never drift from the Column path, because
    // they ARE the same expression tree.
    ("html_extract", "html_extract(html)", (args: Seq[Expression]) => {
      require(args.length == 1, "html_extract(html)")
      graft.operators.Html.extractExpr(args.head)
    }),
    // aggregate function: the analyzer wraps a bare AggregateFunction
    // into its AggregateExpression at resolution, same as built-ins
    ("top_k_rows", "top_k_rows(struct, k)", (args: Seq[Expression]) => {
      require(args.length == 2, "top_k_rows(struct, k)")
      TopKRows(args.head, intLit(args(1), "k"))
    }))

  /** Idempotently registers the native functions into an EXISTING
    * session's function registry — the path for sessions built without
    * `spark.sql.extensions` (embedded use, test harnesses, notebook
    * sessions). Existing registrations are left untouched. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    functions.foreach { case (name, usage, builder) =>
      val id = FunctionIdentifier(name)
      if (!reg.functionExists(id)) {
        reg.registerFunction(id,
          new ExpressionInfo("graft", name, usage), builder)
      }
    }
  }
}
