package graft.streaming

import org.apache.spark.sql.SparkSession

/** Scoped state-store configuration for streaming-query starts.
  *
  * Spark reads `spark.sql.streaming.stateStore.providerClass` (and the
  * state layout's partition count, via `spark.sql.shuffle.partitions`)
  * from the session conf when a streaming query is CONSTRUCTED — the
  * query snapshots the conf into its own cloned session
  * (`StreamExecution.sparkSessionForStream`) and never looks at the
  * live session conf again. There is no per-query writeStream option
  * for the provider, so selecting RocksDB for one daemon means
  * mutating the shared session conf around `start()`.
  *
  * [[withStateConf]] makes that mutation safe: set → start → restore
  * immediately (not on stop), all under one process-wide lock. Two
  * consequences:
  *
  *  - concurrent daemons with different backends can't clobber each
  *    other: the conf is only ever dirty inside the lock, and the
  *    started query already owns its snapshot when the lock releases
  *    (the round-7 advisor's interleaved-stop hazard is gone — there
  *    is nothing left to restore at stop time);
  *  - a co-hosted batch caller never observes a daemon-sized shuffle
  *    partition count or a daemon's provider class, even while the
  *    daemon runs.
  *
  * The YAML pipeline daemons (`StreamingPipeline.start`, both the
  * foreachBatch and NativeWindow paths) funnel through this and honor
  * `state_store` / `state_partitions` from config. The programmatic
  * daemons (Sessionize / Funnel / StreamCdc / StreamHeavyHitters /
  * StreamAsof — the flatMapGroupsWithState family, the state-heaviest
  * paths) return a DataFrame and leave `.writeStream.start()` to the
  * CALLER, so backend selection is the caller's one-line wrap:
  * `StateStores.withStateConf(spark, Some("rocksdb")) { out.writeStream
  * ....start() }` — exactly what SessionizeSpec's RocksDB test does.
  */
object StateStores {

  val ProviderKey = "spark.sql.streaming.stateStore.providerClass"

  private val startLock = new Object

  /** Maps the YAML-level backend name to the provider class.
    * `rocksdb` keys state off the executor heap (open-key cardinality
    * bounded by disk, not JVM heap — the 100×-scale default); `hdfs`
    * is Spark's default in-heap provider. */
  def providerClass(name: String): String = name.toLowerCase match {
    case "rocksdb" =>
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
    case "hdfs" =>
      "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider"
    case other => throw new IllegalArgumentException(
      s"state_store must be 'rocksdb' or 'hdfs', got '$other'")
  }

  /** Run `startQuery` (a `writeStream...start()` call) with the state
    * backend and/or state partition count pinned for that query. The
    * session conf is restored before this returns; the started query
    * keeps the pinned values for its lifetime via its conf snapshot.
    * Both knobs are FIXED at the first batch of a checkpoint —
    * switching either needs a fresh checkpoint dir. */
  def withStateConf[T](
      spark: SparkSession,
      stateStore: Option[String],
      statePartitions: Option[Int] = None)(startQuery: => T): T = {
    if (stateStore.isEmpty && statePartitions.isEmpty) return startQuery
    // validate EVERYTHING before the first conf mutation: a failed
    // require/providerClass after a set would escape with the shared
    // session conf polluted (nothing below the sets may throw outside
    // the try/finally)
    val cls = stateStore.map(providerClass)
    statePartitions.foreach(n =>
      require(n >= 1, "state_partitions must be >= 1"))
    startLock.synchronized {
      val prevProvider = cls.map { c =>
        val prev = spark.conf.getOption(ProviderKey)
        spark.conf.set(ProviderKey, c)
        prev
      }
      val prevShuffle = statePartitions.map { n =>
        val prev = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", n)
        prev
      }
      try startQuery
      finally {
        prevShuffle.foreach(p =>
          spark.conf.set("spark.sql.shuffle.partitions", p))
        prevProvider.foreach {
          case Some(p) => spark.conf.set(ProviderKey, p)
          case None => spark.conf.unset(ProviderKey)
        }
      }
    }
  }
}
