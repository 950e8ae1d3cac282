package graft

import org.apache.spark.sql.SparkSessionExtensions
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
  * Registered: word_shingles(text, n), minhash_sig(shingles, k, seed),
  * simhash64(hashedTokens), rolling_hash64(text), nfc_normalize(text),
  * vec_dot(a, b), text_stats(text), lang_id(text),
  * hyperplane_bands(vec, dim, bands, rowsPerBand, seed).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

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

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, usage: String)(
        builder: Seq[Expression] => Expression): Unit =
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name, usage),
        builder))

    register("word_shingles", "word_shingles(text, n)") { args =>
      require(args.length == 2, "word_shingles(text, n)")
      WordShingles(args.head, intLit(args(1), "n"))
    }
    register("minhash_sig", "minhash_sig(shingles, k, seed)") { args =>
      require(args.length == 3, "minhash_sig(shingles, k, seed)")
      MinHashSig(args.head, intLit(args(1), "k"), longLit(args(2), "seed"))
    }
    register("simhash64", "simhash64(hashedTokens)") { args =>
      require(args.length == 1, "simhash64(hashedTokens)")
      SimHash64(args.head)
    }
    register("rolling_hash64", "rolling_hash64(text)") { args =>
      require(args.length == 1, "rolling_hash64(text)")
      RollingHash64(args.head)
    }
    register("nfc_normalize", "nfc_normalize(text)") { args =>
      require(args.length == 1, "nfc_normalize(text)")
      NfcNormalize(args.head)
    }
    register("vec_dot", "vec_dot(a, b)") { args =>
      require(args.length == 2, "vec_dot(a, b)")
      VecDot(args.head, args(1))
    }
    register("text_stats", "text_stats(text)") { args =>
      require(args.length == 1, "text_stats(text)")
      TextStats(args.head)
    }
    register("rep_stats", "rep_stats(text)") { args =>
      require(args.length == 1, "rep_stats(text)")
      RepStats(args.head)
    }
    register("lang_id", "lang_id(text)") { args =>
      require(args.length == 1, "lang_id(text)")
      LangId(args.head)
    }
    register("duck_extract", "duck_extract(col, 'key')") { args =>
      require(args.length == 2, "duck_extract(col, 'key')")
      DuckArrowExtract(args.head, args(1))
    }
    register("hyperplane_bands",
        "hyperplane_bands(vec, dim, bands, rowsPerBand, seed)") { args =>
      require(args.length == 5, "hyperplane_bands(vec, dim, bands, rowsPerBand, seed)")
      HyperplaneBands(args.head, intLit(args(1), "dim"), intLit(args(2), "bands"),
        intLit(args(3), "rowsPerBand"), longLit(args(4), "seed"))
    }
  }
}
