package graft.tools

import org.apache.spark.sql.SparkSession

/** Iteration-only: run one registry query with a FULL stack trace on
  * failure (Verify/Explain print the message only).
  *   sbt "runMain graft.tools.ReproProbe <sfDir> <query>" */
object ReproProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val name = args(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    try {
      graft.queries.Registry.byName(name).run(spark, dir)
        .write.mode("overwrite").format("noop").save()
      println(s"$name OK")
    } catch { case e: Throwable => e.printStackTrace() }
    spark.stop()
  }
}
