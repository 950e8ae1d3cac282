package graft.tools

import org.apache.spark.sql.SparkSession

/** sf1 scale rehearsal (round-10 judge ask #3): run the most
  * expensive registry gates at sf0.1 and at the ScaleUp-synthesized
  * /tmp/sf1 (10×) and print wall-time scaling factors — the cheap way
  * to catch Σf²/fixture artifacts and shuffle blowups the sf0.1 gate
  * hides. Usage:
  *   sbt "runMain graft.tools.ScaleUp /root/testdata/sf0.1 /tmp/sf1 10"
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.Sf1Rehearsal [/tmp/sf1]"
  * Each gate runs twice per SF (codegen warm; min kept) and is fully
  * materialized via the noop sink. */
object Sf1Rehearsal {

  private val gates = Seq(
    "t11_dedup_jaccard_prefix", "t08_dedup_minhash_lsh",
    "v09_cosine_dup_ivf", "t101_lsh_incremental_dedup",
    "t07_dedup_ngram_jaccard", "v06_cosine_dup_lsh",
    "t10_curation_pipeline", "t06_dedup_exact", "v02_cosine_dup_pairs",
    "v03_ann_topk_bruteforce", "t80_suffix_array", "t81_exact_dup_spans",
    "t27_bloom_incremental_dedup", "t109_incremental_crawl_gate",
    "v38_ivf_incremental_append", "t108_streaming_neardup_replay",
    "v40_streaming_cosine_dedup_replay", "m32_streaming_hamming_dedup_replay",
    "q17_asof_join", "q01_agg_pricing_summary",
    "q03_join_agg_revenue_by_nation")

  def main(args: Array[String]): Unit = {
    val sf1 = args.headOption.getOrElse("/tmp/sf1")
    val sf01 = sys.env.getOrElse("SPARK_GRAFT_SF01", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val byName = graft.queries.Registry.all.map(q => q.name -> q).toMap
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def run(name: String, dir: String): Double = {
      val q = byName(name)
      def once(): Unit = q.run(spark, dir)
        .write.mode("overwrite").format("noop").save()
      once() // warm codegen
      math.min(time(once()), time(once()))
    }
    println(f"${"gate"}%-40s ${"sf0.1"}%8s ${"sf1"}%8s ${"factor"}%7s")
    gates.foreach { g =>
      if (!byName.contains(g)) println(f"$g%-40s  MISSING from registry")
      else try {
        val a = run(g, sf01)
        val b = run(g, sf1)
        println(f"$g%-40s $a%8.2f $b%8.2f ${b / a}%7.1f")
      } catch {
        case scala.util.control.NonFatal(e) =>
          println(f"$g%-40s  FAILED: ${e.getClass.getSimpleName}: ${
            Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    spark.stop()
  }
}
