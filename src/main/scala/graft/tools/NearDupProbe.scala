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

  /** `bytes` mode — the scale-evidence run for the bucketed compact
    * layout: how many BYTES a fixed-size probe reads from the
    * persisted state, before vs after compaction, as admitted history
    * grows. Usage:
    *   sbt "runMain graft.tools.NearDupProbe bytes <histDocs> [probeDocs]"
    * Run at two history sizes (e.g. 25000 and 250000) and compare the
    * `compacted` rows: uncompacted probe bytes grow ~linearly with
    * history, compacted probe bytes stay ~flat once the bucket count
    * outgrows the probe's key count (the SCALE.md cost law). */
  private def bytesMain(histDocs: Int, probeDocs: Int): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    // bytes measured at the PLAN level via the shared StateBytesMeter
    // (see its Scaladoc for why task/FS metrics can't be used here)
    val meter = new StateBytesMeter(spark)
    object bytesRead { def get(): Long = meter.bytes() }
    val stateDir = java.nio.file.Files
      .createTempDirectory("graft_ndbytes").toString
    meter.watch(stateDir)
    // admit history in 10k-doc trigger commits. Texts use per-(doc,
    // position) tokens — ZERO accidental overlap: Bench's small-vocab
    // generator has modular word-shift cycles (docs i and i+451 share
    // 37/39 tokens → genuine near-dups) that make candidate counts —
    // and therefore the text-side pruning — grow with history for
    // reasons that are fixture artifacts, not engine behavior
    def histText(i: Long): String =
      s"d$i " + (1 to 39).map(w => s"w${i}x$w").mkString(" ")
    val chunk = 10000
    val nBids = (histDocs + chunk - 1) / chunk
    (0 until nBids).foreach { bid =>
      val lines = (bid.toLong * chunk until math.min((bid + 1).toLong * chunk,
        histDocs.toLong))
        .map(i => s"""{"doc_id":$i,"text":"${histText(i)}"}""")
      val b = spark.read.json(lines.toDS())
      graft.operators.Dedup.nearDupCommitBatch(b, "doc_id", "text",
        stateDir, bid.toLong, n = 3)
    }
    // fixed probe: mostly novel + 2 exact dups of history (so the
    // candidate/verify path and the text read are exercised)
    val probe = ((0 until probeDocs - 2).map(i =>
      (1000000L + i, s"novel probe document $i " + (1 to 38).map(w =>
        s"p${i}y$w").mkString(" "))) ++ Seq(
      (2000000L, histText(0L)), (2000001L, histText(7L))))
      .toDF("doc_id", "text").cache()
    probe.count()
    def measure(label: String): Long = {
      spark.catalog.clearCache(); probe.cache(); probe.count()
      val t0 = System.nanoTime(); val b0 = bytesRead.get()
      val surv = graft.operators.Dedup.nearDupFilterBatch(probe,
        "doc_id", "text", stateDir, nBids.toLong, n = 3, threshold = 0.7)
      val n = surv.count()
      val db = bytesRead.get() - b0
      println(f"  $label%-12s probe bytes read = ${db / 1e6}%9.2f MB   " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s   survivors=$n")
      n
    }
    def du(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(c => du(c.getPath)).sum
    }
    println(s"history=$histDocs docs ($nBids bids), probe=$probeDocs docs, " +
      f"state on disk = ${du(stateDir) / 1e6}%.2f MB ($stateDir)")
    // calibration: what a FULL scan of each artifact reports
    val c0 = bytesRead.get()
    val nb = spark.read.parquet(s"$stateDir/bands").agg(max(col("bh"))).collect()
    val c1 = bytesRead.get()
    val nt = spark.read.parquet(s"$stateDir/texts")
      .agg(sum(length(col("text")))).collect()
    println(f"  on disk: bands ${du(s"$stateDir/bands") / 1e6}%.2f MB, " +
      f"texts ${du(s"$stateDir/texts") / 1e6}%.2f MB; full-scan " +
      f"calibration: bands ${(c1 - c0) / 1e6}%.2f MB, " +
      f"texts ${(bytesRead.get() - c1) / 1e6}%.2f MB " +
      s"(${nb.head} ${nt.head})")
    val sUnc = measure("uncompacted")
    graft.operators.Dedup.compactNearDupState(spark, stateDir,
      upToBid = nBids - 1L, minReplayableBid = nBids.toLong,
      bandRowsPerBucket = 1024L, textRowsPerBucket = 128L)
    println(f"  state on disk after fold = ${du(stateDir) / 1e6}%.2f MB; " +
      s"band buckets = ${new java.io.File(s"$stateDir/compact")
        .listFiles().head.toPath.resolve("bands").toFile.listFiles().length}")
    val sCom = measure("compacted")
    assert(sUnc == sCom, s"survivor mismatch: $sUnc vs $sCom")
    println(s"  (survivor count identical pre/post fold: $sUnc)")
    spark.stop()
  }

  /** `knee` mode — the round-10 evidence run for the bucket-cap knee:
    * the SAME admitted corpus folded twice, once with the bucket count
    * CAPPED below the probe's key count (the old 64k default, scaled
    * down: the regime SCALE.md's 10⁹-doc projection lands in — every
    * bucket is hit and the probe re-reads the whole index) and once
    * with the corpus-proportional count (cap lifted), probed by the
    * same batch. Prints probe bytes for both plus the survivor
    * identity. Usage:
    *   sbt "runMain graft.tools.NearDupProbe knee <histDocs> <probeDocs> [cappedBuckets] [rowsPerBucket]"
    * Run at two history sizes to see the grown-fold bytes stay FLAT
    * while the capped-fold bytes track the index. */
  private def kneeMain(histDocs: Int, probeDocs: Int,
      cappedBuckets: Int, rowsPerBucket: Long): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val meter = new StateBytesMeter(spark)
    def histText(i: Long): String =
      s"d$i " + (1 to 39).map(w => s"w${i}x$w").mkString(" ")
    val chunk = 20000
    val nBids = (histDocs + chunk - 1) / chunk
    val base = java.nio.file.Files.createTempDirectory("graft_ndknee")
    val capped = s"$base/capped"
    val grown = s"$base/grown"
    (0 until nBids).foreach { bid =>
      val lines = (bid.toLong * chunk until math.min((bid + 1).toLong * chunk,
        histDocs.toLong))
        .map(i => s"""{"doc_id":$i,"text":"${histText(i)}"}""")
      val b = spark.read.json(lines.toDS())
      graft.operators.Dedup.nearDupCommitBatch(b, "doc_id", "text",
        capped, bid.toLong, n = 3)
    }
    // identical state for the grown fold (fs copy beats re-sketching)
    def copyTree(src: java.nio.file.Path, dst: java.nio.file.Path): Unit = {
      java.nio.file.Files.walk(src).forEach { p =>
        val t = dst.resolve(src.relativize(p))
        if (java.nio.file.Files.isDirectory(p))
          java.nio.file.Files.createDirectories(t)
        else java.nio.file.Files.copy(p, t)
      }
    }
    copyTree(java.nio.file.Paths.get(capped), java.nio.file.Paths.get(grown))
    val tCap0 = System.nanoTime()
    graft.operators.Dedup.compactNearDupState(spark, capped,
      upToBid = nBids - 1L, minReplayableBid = nBids.toLong,
      bandRowsPerBucket = rowsPerBucket, textRowsPerBucket = 128L,
      maxBuckets = cappedBuckets)
    val tCap = (System.nanoTime() - tCap0) / 1e9
    val tGro0 = System.nanoTime()
    graft.operators.Dedup.compactNearDupState(spark, grown,
      upToBid = nBids - 1L, minReplayableBid = nBids.toLong,
      bandRowsPerBucket = rowsPerBucket, textRowsPerBucket = 128L)
    val tGro = (System.nanoTime() - tGro0) / 1e9
    def du(p: String): Long = {
      val f = new java.io.File(p)
      if (!f.exists()) 0L
      else if (f.isFile) f.length()
      else f.listFiles().map(c => du(c.getPath)).sum
    }
    def buckets(dir: String) = new java.io.File(dir)
      .listFiles().head.toPath.resolve("bands").toFile
      .listFiles().count(_.getName.startsWith("__pb="))
    // probe: mostly novel + 2 near-dups of folded history
    val probe = ((0 until probeDocs - 2).map(i =>
      (1000000L + i, s"novel probe document $i " + (1 to 38).map(w =>
        s"p${i}y$w").mkString(" "))) ++ Seq(
      (2000000L, histText(0L)), (2000001L, histText(7L))))
      .toDF("doc_id", "text").cache()
    probe.count()
    val batchKeys = probeDocs * 32 // 32 bands per doc
    println(s"history=$histDocs docs ($nBids bids, ${nBids * chunk * 32L} band rows), " +
      s"probe=$probeDocs docs (~$batchKeys band keys)")
    println(f"  capped fold:  ${buckets(s"$capped/compact")}%7d band buckets " +
      f"(cap=$cappedBuckets), index on disk ${du(s"$capped/compact") / 1e6}%9.2f MB, fold $tCap%6.1f s")
    println(f"  grown fold:   ${buckets(s"$grown/compact")}%7d band buckets " +
      f"(corpus/rowsPerBucket), index on disk ${du(s"$grown/compact") / 1e6}%9.2f MB, fold $tGro%6.1f s")
    def measure(label: String, dir: String): Long = {
      spark.catalog.clearCache(); probe.cache(); probe.count()
      meter.watch(dir)
      val t0 = System.nanoTime(); val b0 = meter.bytes()
      val surv = graft.operators.Dedup.nearDupFilterBatch(probe,
        "doc_id", "text", dir, nBids.toLong, n = 3, threshold = 0.7)
      val n = surv.count()
      val db = meter.bytes() - b0
      println(f"  $label%-12s probe bytes read = ${db / 1e6}%9.2f MB   " +
        f"${(System.nanoTime() - t0) / 1e9}%6.2f s   survivors=$n")
      n
    }
    val sCap = measure("capped", capped)
    val sGro = measure("grown", grown)
    assert(sCap == sGro,
      s"pruned ≡ unpruned admission identity violated: $sCap vs $sGro")
    println(s"  (survivor identity holds: $sCap)")
    spark.stop()
  }

  def main(args: Array[String]): Unit = {
    if (args.headOption.contains("knee")) {
      kneeMain(args.lift(1).map(_.toInt).getOrElse(500000),
        args.lift(2).map(_.toInt).getOrElse(200),
        args.lift(3).map(_.toInt).getOrElse(2048),
        args.lift(4).map(_.toLong).getOrElse(512L))
      return
    }
    if (args.headOption.contains("bytes")) {
      bytesMain(args.lift(1).map(_.toInt).getOrElse(25000),
        args.lift(2).map(_.toInt).getOrElse(16))
      return
    }
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
