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
    for (n <- Seq("t22_pack_sequences","t23_repetition_signals","v08_centroid_outlier",
        "m06_image_decode_real","m07_image_resize_real","q25_percentiles","q26_pivot_revenue")) {
      val q = Registry.byName(n)
      q.run(spark, dir).write.mode("overwrite").format("noop").save() // warm
      val t0 = System.nanoTime()
      q.run(spark, dir).write.mode("overwrite").format("noop").save()
      println(f"$n%-28s ${(System.nanoTime()-t0)/1e9}%.2f s")
    }
    spark.stop()
  }
}
