package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Synthesize an sf1-scale fixture (10× sf0.1) for scale rehearsals —
  * the environment ships testdata only up to sf0.1, and /root/testdata
  * is read-only, so the 10× set is derived:
  *
  *   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
  *
  * Each copy k gets disjoint key ranges (every key column offset by
  * k·(max+1), foreign keys offset consistently so join fan-outs stay
  * exactly sf0.1-shaped per copy). Dimension tables (region, nation)
  * are NOT copied — TPC-H holds them constant across SF, which is
  * what keeps q03's broadcast claim honest at scale.
  *
  * Content columns are put in per-copy token spaces: every word in
  * `documents.text` gains a copy suffix, and embeddings get a small
  * deterministic per-(copy, dim) perturbation. This models a corpus
  * 10× the size at the SAME duplicate density (each copy's internal
  * near-dup structure is preserved; nothing collides across copies) —
  * the linear-growth regime an engine must scale through. Without it,
  * naive copy-duplication multiplies every shingle frequency by K and
  * Σf² by K², turning the rehearsal into a duplicate-bomb benchmark
  * instead of a scale benchmark (that regime is covered separately by
  * DedupSpec's adversarial corpora). */
object ScaleUp {

  def main(args: Array[String]): Unit = {
    val src = args.headOption.getOrElse("/root/testdata/sf0.1")
    val dst = if (args.length > 1) args(1) else "/tmp/sf1"
    val k = if (args.length > 2) args(2).toInt else 10
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "16"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def span(df: DataFrame, c: String): Long =
      df.agg(max(col(c))).head.getLong(0) + 1

    val maxCust = span(read("customer"), "c_custkey")
    val maxOrd = span(read("orders"), "o_orderkey")
    val maxPart = span(read("part"), "p_partkey")
    val maxSupp = span(read("supplier"), "s_suppkey")
    val maxDoc = span(read("documents"), "doc_id")
    val maxVec = span(read("embeddings"), "vec_id")
    val maxEvt = span(read("events"), "event_id")
    val maxUser = span(read("events"), "user_id")

    /** K copies of df with the given Long columns offset per copy. */
    def copies(df: DataFrame, offsets: Map[String, Long],
        extra: (DataFrame, Int) => DataFrame = (d, _) => d): DataFrame =
      (0 until k).map { i =>
        val shifted = offsets.foldLeft(df) { case (acc, (c, m)) =>
          acc.withColumn(c, col(c) + lit(i * m))
        }
        extra(shifted, i)
      }.reduce(_ unionByName _)

    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dst/$name.parquet")
      println(s"SCALEUP $name -> ${spark.read.parquet(s"$dst/$name.parquet").count()} rows")
    }

    // dimensions: constant across SF (as in TPC-H)
    write("region", read("region"))
    write("nation", read("nation"))

    write("customer", copies(read("customer"), Map("c_custkey" -> maxCust)))
    write("supplier", copies(read("supplier"), Map("s_suppkey" -> maxSupp)))
    write("part", copies(read("part"), Map("p_partkey" -> maxPart)))
    write("orders", copies(read("orders"),
      Map("o_orderkey" -> maxOrd, "o_custkey" -> maxCust)))
    write("lineitem", copies(read("lineitem"),
      Map("l_orderkey" -> maxOrd, "l_partkey" -> maxPart,
        "l_suppkey" -> maxSupp)))
    write("events", copies(read("events"),
      Map("event_id" -> maxEvt, "user_id" -> maxUser)))

    // documents: per-copy token space (suffix every word)
    write("documents", copies(read("documents"), Map("doc_id" -> maxDoc),
      (d, i) => if (i == 0) d else d.withColumn("text",
        regexp_replace(col("text"), "(\\p{L}+)", s"$$1x$i"))))

    // embeddings: deterministic per-(copy, dim) jitter breaks
    // cross-copy cosine collisions while keeping within-copy geometry
    write("embeddings", copies(read("embeddings"), Map("vec_id" -> maxVec),
      (d, i) => if (i == 0) d else d.withColumn("embedding",
        transform(col("embedding"), (x, j) =>
          (x + (pmod(xxhash64(lit(i) * 1000 + j), lit(200)).cast("float") -
            lit(100f)) / lit(1000f)).cast("float")))))

    spark.stop()
  }
}
