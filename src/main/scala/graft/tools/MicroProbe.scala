package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro-benchmarks of per-task / per-stage fixed costs on this host:
  * empty tasks, tiny shuffles, expression-only stages — separates the
  * scheduler/codegen floor from real per-row work (guide §1).
  *   sbt "runMain graft.tools.MicroProbe"
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sc = spark.sparkContext

    def time(name: String, reps: Int = 3)(f: => Unit): Unit = {
      f // warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$name%-46s ${ts.min}%7.3f s (min of $reps)")
    }

    time("empty RDD job, 32 tasks") {
      sc.parallelize(1 to 32, 32).count(); ()
    }
    time("empty RDD job, 1 task") {
      sc.parallelize(1 to 1, 1).count(); ()
    }
    val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    time("docs scan noop (1 task)") {
      docs.write.mode("overwrite").format("noop").save()
    }
    time("docs repartition(32) noop") {
      docs.repartition(32).write.mode("overwrite").format("noop").save()
    }
    time("docs repartition(32) + md5 noop") {
      docs.repartition(32)
        .select(md5(col("text")).as("h"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs md5 noop (1 task, no repartition)") {
      docs.select(md5(col("text")).as("h"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs normalize+md5 (1 task)") {
      docs.select(md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))).as("h"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs wordShingles(3) (1 task)") {
      docs.select(graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs wordShingles(3) 32 tasks") {
      docs.repartition(32)
        .select(graft.functions.TextFunctions.wordShingles(col("text"), 3).as("sh"))
        .write.mode("overwrite").format("noop").save()
    }
    time("docs minhashSig(64) 32 tasks") {
      docs.repartition(32)
        .select(graft.functions.TextFunctions.minhashSignature(
          graft.functions.TextFunctions.wordShingles(col("text"), 3), 64, 42L).as("sig"))
        .write.mode("overwrite").format("noop").save()
    }
    time("groupBy shuffle 32p (5k rows)") {
      docs.groupBy("doc_id").agg(count(lit(1)))
        .write.mode("overwrite").format("noop").save()
    }
    time("groupBy shuffle 32p + orderBy") {
      docs.groupBy("doc_id").agg(count(lit(1)).as("n")).orderBy("doc_id")
        .write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
