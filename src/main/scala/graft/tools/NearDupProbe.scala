package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Stage-level timing probe for the `handlers.NearDupFilter` daemon —
  * isolates where a trigger's wall-clock goes behind BENCH's
  * `neardup_filter_docs_per_sec`: within-batch LSH pairs, the
  * connected-components canonical drop, the persisted-index probe,
  * and the two commit writes. Usage:
  *   SPARK_GRAFT_CPUS=16 sbt "runMain graft.tools.NearDupProbe [nDocs]"
  * Prints per-stage seconds for 3 consecutive batches. */
object NearDupProbe {

  private def docLine(i: Long, batch: Int): String = {
    val base =
      if (i % 10 == 9) i - 5
      else if (i % 7 == 0 && i >= batch) i - batch
      else i
    // identical IFF bases match (mirrors Bench.nearDupDocLine)
    val words = s"d$base" +: (1 until 40).map(w =>
      s"w${math.floorMod(base * 2654435761L + w * 1099511628211L, 50000L)}")
    s"""{"doc_id":$i,"text":"${words.mkString(" ")}"}"""
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val nDocs = args.headOption.map(_.toInt).getOrElse(10000)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ndprobe").toString
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"  $label%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }

    (0 until 3).foreach { bid =>
      println(s"batch $bid ($nDocs docs):")
      val lines = (bid.toLong * nDocs until (bid + 1).toLong * nDocs)
        .map(i => docLine(i, nDocs))
      val batch = t("parse") {
        val df = spark.read.json(lines.toDS()).cache()
        df.count()
        df
      }
      t("sketch only (shingles+minhash)") {
        graft.queries.Tables.spread(batch)
          .select(col("doc_id"),
            graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
          .withColumn("sig",
            graft.functions.TextFunctions.minhashSignature(col("sh"), 64, 42L))
          // force BOTH computed columns (a bare count would let the
          // optimizer prune the shingle/minhash work away entirely)
          .select(sum(size(col("sh"))), sum(element_at(col("sig"), 1)))
          .collect()
      }
      val pairs = t("lsh pairs (materialize)") {
        val p = Dedup.minhashLshPairs(batch, "doc_id", "text",
          n = 3, threshold = 0.7).cache()
        p.count()
        p
      }
      val dropped = t("connected components drop") {
        val d = Dedup.dropNonCanonical(batch, pairs, "doc_id", lit(0)).cache()
        d.count()
        d
      }
      val within = batch.join(
        dropped.select(col("doc_id").as("__drop_id")),
        col("doc_id") === col("__drop_id"), "left_anti")
      val survivors = t("full filter (incl probe)") {
        val s = Dedup.nearDupFilterBatch(batch, "doc_id", "text",
          stateDir, bid.toLong, n = 3, threshold = 0.7).cache()
        s.count()
        s
      }
      t("commit")(Dedup.nearDupCommitBatch(survivors, "doc_id", "text",
        stateDir, bid.toLong, n = 3))
      Seq(batch, pairs, dropped, survivors).foreach(_.unpersist())
      val _ = within
    }
    spark.stop()
  }
}
