package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Pinpoints the winnowing expression cost: same computation with and
  * without materialization barriers between the array stages. */
object WinnowProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val base = graft.queries.Tables.t(spark, "/root/testdata/sf0.1", "documents")
      .select(col("doc_id"), col("text"))
    val docs = (0 until 4).map { r =>
      base.select((col("doc_id") + lit(r * 10000000L)).as("doc_id"), col("text"))
    }.reduce(_ unionByName _).cache()
    docs.count()
    def timed[A](tag: String)(f: => A): Unit = {
      val t0 = System.nanoTime(); val a = f
      println(f"$tag: ${(System.nanoTime() - t0) / 1e9}%.1fs -> $a")
    }
    val toksCol = graft.functions.TextFunctions.tokens(col("text"))
    val gramsExpr =
      """CASE WHEN size(toks) >= 3
         THEN transform(sequence(0, size(toks)-3),
           i -> md5(cast(concat_ws(' ', slice(toks, i+1, 3)) as binary)))
         ELSE array(md5(cast(concat_ws(' ', toks) as binary))) END"""
    val fpsExpr =
      """array_sort(array_distinct(transform(
           sequence(0, greatest(size(grams)-4, 0)),
           j -> array_min(slice(grams, j+1, 4)))))"""

    // pipeline, no barriers (the shipped shape)
    val v1 = docs.select(col("doc_id"), toksCol.as("toks"))
      .withColumn("grams", expr(gramsExpr))
      .withColumn("fps", expr(fpsExpr))
    timed("v1 pipelined")(v1.select(explode(col("fps"))).count())

    // barrier after grams (cache materializes the column)
    val g = docs.select(col("doc_id"), toksCol.as("toks"))
      .withColumn("grams", expr(gramsExpr)).persist()
    g.count()
    val v2 = g.withColumn("fps", expr(fpsExpr))
    timed("v2 grams materialized")(v2.select(explode(col("fps"))).count())
    g.unpersist()

    // barrier after toks only
    val t = docs.select(col("doc_id"), toksCol.as("toks")).persist()
    t.count()
    val v3 = t.withColumn("grams", expr(gramsExpr)).withColumn("fps", expr(fpsExpr))
    timed("v3 toks materialized")(v3.select(explode(col("fps"))).count())
    t.unpersist()
    spark.stop()
  }
}
