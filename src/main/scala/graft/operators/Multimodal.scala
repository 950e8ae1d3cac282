package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column plumbing for training-data
  * pipelines: media travels as an opaque `binary` column with typed
  * metadata; decode / feature-extract / resize / frame-sample run as
  * partition-local batch transforms (`mapPartitions` — the Scala
  * analogue of PySpark's mapInPandas batches).
  *
  * The decode kernels themselves are STUBS (this environment has no
  * image/audio codecs): they produce deterministic pseudo-metadata and
  * pseudo-features derived from the bytes, so the Spark-side contract —
  * schema, nullability, partitioning, batch shape, feature dimensions —
  * is real and tested, and a codec can be dropped into `decodeKernel`/
  * `featureKernel` without touching the plan. */
object Multimodal {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("kind", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("source", StringType, nullable = true)))

  /** STUB decode kernel — replace with a real codec (e.g. TwelveMonkeys
    * / javacv) in production. Deterministic in the content bytes. */
  private def decodeKernel(content: Array[Byte]): (Int, Int, Int) = {
    // ??? real codec goes here; deterministic fake below
    if (content == null || content.isEmpty) (0, 0, 0)
    else {
      var h = 1125899906842597L
      content.foreach(b => h = h * 31 + b)
      val w = 64 + math.floorMod(h, 1024).toInt
      val ht = 64 + math.floorMod(h >> 16, 1024).toInt
      (w, ht, 3)
    }
  }

  /** STUB feature kernel → fixed-dim embedding (deterministic fake). */
  private def featureKernel(content: Array[Byte], dim: Int): Array[Float] = {
    // ??? real feature extractor goes here; hash-projection fake below
    val out = new Array[Float](dim)
    if (content == null) return out
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < content.length) {
      h = (h ^ content(i)) * 0xC2B2AE3D27D4EB4FL
      out(math.floorMod(h, dim).toInt) += ((h >> 32).toInt % 1000) / 1000.0f
      i += 1
    }
    out
  }

  private val decodedSchema = StructType(mediaSchema.fields.toSeq ++ Seq(
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("channels", IntegerType),
    StructField("n_bytes", LongType)))

  /** Decode pass: binary → (width, height, channels, n_bytes) metadata.
    * Partition-local, no shuffle; at 100 TB this is a pure map stage
    * whose parallelism is the input partitioning. */
  def decodeMeta(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(decodedSchema)
    media.select(mediaSchema.fieldNames.map(col).toIndexedSeq: _*)
      .mapPartitions { rows =>
        rows.map { r =>
          val content = r.getAs[Array[Byte]]("content")
          val (w, h, c) = decodeKernel(content)
          Row.fromSeq(r.toSeq ++ Seq(w, h, c,
            if (content == null) 0L else content.length.toLong))
        }
      }(enc)
  }

  /** Feature-extraction pass: binary → float embedding column, batched
    * per partition. Output feeds Similarity.* (ANN / dedup). */
  def extractFeatures(media: DataFrame, dim: Int = 64): DataFrame = {
    val spark = media.sparkSession
    val outSchema = StructType(Seq(
      StructField("media_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    val enc = org.apache.spark.sql.catalyst.encoders.RowEncoder
      .encoderFor(outSchema)
    media.select(col("media_id"), col("content"))
      .mapPartitions { rows =>
        rows.map { r =>
          Row(r.getLong(0), featureKernel(r.getAs[Array[Byte]](1), dim).toSeq)
        }
      }(enc)
  }

  /** Resize pass (image): clamp decoded dimensions to a bounding box
    * preserving aspect ratio, and re-emit content scaled down
    * proportionally (STUB: real codecs re-encode pixels; the stub
    * truncates bytes by the area ratio so downstream size accounting
    * is exercised). Pure map stage — partition-local, no shuffle. */
  def resize(media: DataFrame, maxW: Int, maxH: Int): DataFrame = {
    require(maxW > 0 && maxH > 0)
    val decoded = decodeMeta(media)
    val scale = least(
      lit(1.0),
      lit(maxW) / col("width").cast("double"),
      lit(maxH) / col("height").cast("double"))
    decoded
      .withColumn("out_width", greatest(lit(1), floor(col("width") * scale).cast("int")))
      .withColumn("out_height", greatest(lit(1), floor(col("height") * scale).cast("int")))
      .withColumn("out_content",
        // ??? real image re-encode goes here; byte-truncation stub below
        // (try_divide: empty/null content decodes to 0×0, and ANSI mode —
        // Spark 4's default — would abort the job on 0/0)
        expr("substring(content, 1, greatest(1, cast(n_bytes * " +
          "coalesce(try_divide(out_width * out_height, width * height), 0) as int)))"))
      .select(col("media_id"), col("kind"), col("out_width"), col("out_height"),
        col("out_content"), length(col("out_content")).as("out_bytes"))
  }

  /** Frame-sampling pass (video): one row per sampled frame, frame
    * count derived from content size (stub: 1 frame / `frameBytes`).
    * The explode happens partition-locally; downstream ops see a
    * larger but still co-partitioned dataset. */
  def sampleFrames(media: DataFrame, everyNth: Int = 10,
      frameBytes: Int = 4096): DataFrame = {
    require(everyNth > 0 && frameBytes > 0)
    media
      .withColumn("n_frames",
        greatest(lit(1), (length(col("content")) / frameBytes).cast("int")))
      .withColumn("frame_idx",
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyNth))))
      .select(col("media_id"), col("kind"), col("frame_idx"), col("n_frames"))
  }

  /** Synthesize a media table from any table with an id + string column
    * (used for tests/benchmarks in lieu of real media files). */
  def synthesize(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("media_id"),
      (when(pmod(col(idCol), lit(3)) === 0, "image")
        .when(pmod(col(idCol), lit(3)) === 1, "audio")
        .otherwise("video")).as("kind"),
      encode(col(textCol), "UTF-8").as("content"),
      lit("synthetic").as("source"))
}
