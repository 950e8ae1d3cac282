package graft

import org.apache.spark.sql.functions._
import graft.operators.UrlOps

class UrlOpsSpec extends SparkTestBase {
  import spark.implicits._

  private def canon(urls: String*): Seq[String] =
    urls.toDF("u").select(UrlOps.canonicalizeUrl(col("u")).as("c"))
      .collect().map(_.getString(0)).toSeq

  test("canonicalizeUrl: lowercases scheme+host only, path case preserved") {
    assert(canon("HTTPS://WWW.Example.COM/Path/File.HTML") ==
      Seq("https://example.com/Path/File.HTML"))
  }

  test("canonicalizeUrl: drops fragment, default ports, trailing slash") {
    assert(canon(
      "https://a.com:443/x#frag",
      "http://b.com:80/y/",
      "https://c.com:8443/z",          // non-default port kept
      "https://d.com/w/?q=1") ==
      Seq("https://a.com/x", "http://b.com/y", "https://c.com:8443/z",
        "https://d.com/w?q=1"))
  }

  test("canonicalizeUrl: strips utm_* params, keeps others in order") {
    assert(canon(
      "https://a.com/p?utm_source=x&ref=7&utm_campaign=y&q=2",
      "https://a.com/p?utm_source=x",
      "https://a.com/p?ref=7&utm_medium=m",
      "https://a.com/p?b=2&a=1") ==       // order preserved, not sorted
      Seq("https://a.com/p?ref=7&q=2", "https://a.com/p",
        "https://a.com/p?ref=7", "https://a.com/p?b=2&a=1"))
  }

  test("urlDedup groups re-crawls under one canonical url") {
    val docs = Seq(
      (1L, "https://WWW.site.com/a?utm_source=feed"),
      (2L, "https://site.com:443/a"),
      (3L, "https://site.com/a#top"),
      (4L, "https://site.com/b")).toDF("doc_id", "url")
    val out = UrlOps.urlDedup(docs, "doc_id", "url")
      .orderBy("canon_url").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      Seq(("https://site.com/a", 3L, 1L), ("https://site.com/b", 1L, 4L)))
  }
}
