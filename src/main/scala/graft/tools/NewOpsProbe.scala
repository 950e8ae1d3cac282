package graft.tools
import org.apache.spark.sql.SparkSession
import graft.queries.Registry
object NewOpsProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- Seq("t31_dedup_containment","t32_bigram_surprisal","t33_pmi_collocations",
        "t34_winnowing_fingerprints","t35_temperature_mixture","v10_dimension_stats",
        "v11_semantic_contamination","q35_percent_rank_cume","q36_calendar_zero_fill")) {
      val q = Registry.byName(n)
      q.run(spark, dir).write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      q.run(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
