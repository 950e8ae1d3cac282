package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for keyed shuffles.
  *
  * Spark's first lines of defense at scale are (in order) broadcast
  * joins for small sides and AQE's runtime skew-join splitting for
  * sort-merge joins. Salting is the remaining tool when neither
  * applies: a dimension too big to broadcast joined on a key where a
  * few values dominate (the classic hot-key problem — one straggler
  * task holds the job).
  *
  * [[saltedJoin]] spreads each hot key over `numSalts` reducers by
  * appending a salt derived from a hash of the fact row (deterministic
  * — replay-stable, unlike `rand()`), and replicating each dimension
  * row `numSalts` times. Cost model: dimension shuffle volume ×
  * numSalts buys fact-side parallelism × numSalts on hot keys; size
  * `numSalts` to the skew factor, not the cluster. */
object Skew {

  /** Equi-join `fact ⋈ dim` on `keys`, with the fact side salted.
    * Result is identical to `fact.join(dim, keys, joinType)` for
    * `inner` and `left` join types (each fact row still meets every
    * matching dim row exactly once — dim replicas are disjoint by
    * salt). */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      keys: Seq[String],
      numSalts: Int,
      joinType: String = "inner"): DataFrame = {
    require(numSalts >= 1)
    require(Seq("inner", "left", "left_outer").contains(joinType),
      s"salted join supports inner/left, got $joinType")
    // deterministic per-row salt: hash of the whole fact row
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(struct(fact.columns.map(col): _*)), lit(numSalts)))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until numSalts).map(i => lit(i.toLong)): _*)))
    salted
      .join(replicated, keys :+ "__salt", joinType)
      .drop("__salt")
  }

  /** Top key frequencies of `keyCol` — the diagnostic used to decide
    * whether a join needs salting (run on a sample at scale). */
  def keyHistogram(df: DataFrame, keyCol: String, topK: Int = 20): DataFrame =
    df.groupBy(keyCol)
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col(keyCol))
      .limit(topK)
}
