package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** HTML → text extraction (the C4/CCNet ingestion step that precedes
  * every text-quality operator: raw web crawl records are HTML, the
  * corpus wants prose). A deliberately small, deterministic subset of
  * what trafilatura/jusText do — enough to strip markup, scripting,
  * and the 5 predefined XML entities — expressed entirely as Catalyst
  * regexp/replace column algebra: map-only, codegen'd, zero shuffle,
  * linear in input bytes, and replayable verbatim in a DuckDB oracle
  * (both engines run the identical chain, so the gate checks the
  * extraction byte-for-byte via md5).
  *
  * Chain (order matters):
  *  1. drop `<script>…</script>` / `<style>…</style>` blocks
  *     INCLUDING content (non-greedy, DOTALL — content is code, not
  *     prose; a bare tag-strip would leak JavaScript into the corpus);
  *  2. drop `<!-- … -->` comments;
  *  3. every remaining tag → one space (block boundaries must not
  *     glue words: `<p>a</p><p>b</p>` → "a b", not "ab");
  *  4. decode the predefined entities — `&amp;` LAST so `&amp;lt;`
  *     decodes to the literal text "&lt;", not "<" (single-pass
  *     semantics);
  *  5. whitespace-squeeze + trim.
  */
object Html {

  /** Extracted text of an HTML column. */
  def extractText(html: Column): Column =
    org.apache.spark.sql.graftx.Bridge.column(
      extractExpr(org.apache.spark.sql.graftx.Bridge.expression(html)))

  /** The chain as a concrete Catalyst expression tree — the single
    * source for both the Column API and the `html_extract` SQL
    * function (GraftExtensions): a function builder must return
    * evaluable expressions, and sharing the tree means the two entry
    * points can never drift. */
  private[graft] def extractExpr(
      html: org.apache.spark.sql.catalyst.expressions.Expression)
      : org.apache.spark.sql.catalyst.expressions.Expression = {
    import org.apache.spark.sql.catalyst.expressions.{
      Literal, RegExpReplace, StringReplace, StringTrim}
    def rr(c: org.apache.spark.sql.catalyst.expressions.Expression,
        pat: String) = RegExpReplace(c, Literal(pat), Literal(" "))
    val noScript = rr(html, "(?is)<script\\b[^>]*>.*?</script>")
    val noStyle = rr(noScript, "(?is)<style\\b[^>]*>.*?</style>")
    val noComment = rr(noStyle, "(?s)<!--.*?-->")
    val noTags = rr(noComment, "(?s)<[^>]*>")
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "'", "&amp;" -> "&")
      .foldLeft(noTags:
          org.apache.spark.sql.catalyst.expressions.Expression) {
        case (c, (from, to)) =>
          StringReplace(c, Literal(from), Literal(to))
      }
    StringTrim(RegExpReplace(ent, Literal("\\s+"), Literal(" ")))
  }

  /** The same chain as a DuckDB SQL expression over `inExpr` — kept
    * adjacent to [[extractText]] so the two stay in lockstep (the
    * oracle contract is "identical chain, identical bytes"). */
  def duckExtractText(inExpr: String): String = {
    val noScript =
      s"regexp_replace($inExpr, '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g')"
    val noStyle =
      s"regexp_replace($noScript, '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g')"
    val noComment = s"regexp_replace($noStyle, '(?s)<!--.*?-->', ' ', 'g')"
    val noTags = s"regexp_replace($noComment, '(?s)<[^>]*>', ' ', 'g')"
    // escaping: in a single-quoted SQL literal only ' doubles; a
    // literal " needs no escape (a doubled "" would insert two chars)
    val ent = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
        "&#39;" -> "''", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (from, to)) =>
        s"replace($c, '$from', '$to')"
      }
    s"trim(regexp_replace($ent, '\\s+', ' ', 'g'))"
  }
}
