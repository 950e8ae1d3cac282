package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** URL canonicalization + URL-level dedup — the first dedup pass of a
  * web-crawl curation pipeline (CCNet/RefinedWeb-style: near-all exact
  * re-crawls share a canonical URL, so collapsing on it removes the
  * bulk of duplicates for the price of one keyed shuffle over SHORT
  * strings, before any content hashing runs).
  *
  * Canonical form (the common normalization core):
  *   1. scheme + host lowercased (path/query case preserved — they are
  *      case-sensitive per RFC 3986);
  *   2. fragment dropped (`#…` — never sent to the server);
  *   3. default port stripped (`:443` for https, `:80` for http);
  *   4. leading `www.` stripped;
  *   5. `utm_*` tracking parameters removed, other parameters kept in
  *      their original order (reordering would conflate genuinely
  *      different URLs on servers that care);
  *   6. trailing `/` stripped (also before `?`).
  *
  * Everything is plain `regexp_replace`/`replace` column algebra —
  * codegen'd, map-only, zero shuffle; the dedup adds ONE aggregation
  * keyed on the canonical string. At 100 TB the canonical-url agg is
  * the cheapest dedup stage in the pipeline (keys are ~60-byte
  * strings, uniformly hashed).
  */
object UrlOps {

  /** The canonicalization as a composable Column (steps 1–6 above). */
  def canonicalizeUrl(url: Column): Column = {
    // 1. lowercase scheme://host[:port] (everything before the first
    //    '/' after '//'), preserve the rest
    val head = regexp_extract(url, "^([^/]*//[^/]*)", 1)
    val lowered = concat(lower(head),
      url.substr(length(head) + 1, lit(Int.MaxValue)))
    // compose the remaining steps as successive rewrites
    val noFragment = regexp_replace(lowered, "#.*$", "")
    val noPort = regexp_replace(
      regexp_replace(noFragment, "^(https://[^/:]+):443(?=[/?]|$)", "$1"),
      "^(http://[^/:]+):80(?=[/?]|$)", "$1")
    val noWww = regexp_replace(noPort, "^(https?://)www\\.", "$1")
    // utm params: drop non-leading (&utm_…), then a leading one that
    // has followers (?utm_…& → ?), then a lone one (?utm_…$ → ε)
    val noUtm = regexp_replace(
      regexp_replace(
        regexp_replace(noWww, "&utm_[^&#]*", ""),
        "\\?utm_[^&#]*&", "?"),
      "\\?utm_[^&#]*$", "")
    // trailing slash: bare (…/ → …) and before the query (/? → ?)
    regexp_replace(regexp_replace(noUtm, "/\\?", "?"), "/$", "")
  }

  /** URL-level dedup: canonicalize, then ONE agg keyed on the
    * canonical string. Returns (canon_url, n_docs, first_doc) — the
    * keeper is the smallest id, the deterministic canonical-doc rule
    * the content-level dedups (t20/t21) also use. */
  def urlDedup(docs: DataFrame, idCol: String, urlCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"),
        canonicalizeUrl(col(urlCol)).as("canon_url"))
      .groupBy("canon_url")
      .agg(count(lit(1)).as("n_docs"), min("doc_id").as("first_doc"))
}
