package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-frame modes the ANSI/DuckDB surface has and Spark does not:
  * `GROUPS BETWEEN n PRECEDING AND CURRENT ROW` and the frame
  * `EXCLUDE` clauses (EXCLUDE CURRENT ROW / EXCLUDE GROUP). Spark
  * only plans ROWS and RANGE frames, so each is re-expressed as a
  * composition whose per-row result is identical.
  *
  * Reference surface: DuckDB window frames
  * (duckdb docs/sql/functions/window_functions — GROUPS mode,
  * EXCLUDE clause); the reference engine executes handler SQL on
  * DuckDB so these are part of its queryable surface.
  *
  * Scale shapes:
  *  - GROUPS: one groupBy shuffle onto the distinct (part, order)
  *    keys, a ROWS window over that GROUP-LEVEL table (tiny: one row
  *    per distinct order value), then a join back — the group table
  *    is |distinct keys| rows, usually broadcastable, so the join
  *    back costs no extra shuffle beyond the groupBy's.
  *  - EXCLUDE: pure arithmetic against the INCLUSIVE frame Spark can
  *    already compute (frame_sum − current contribution), map-side
  *    over the windowed result — no extra shuffle at all.
  */
object WindowFrames {

  /** `sum(value) OVER (PARTITION BY part ORDER BY ord
    *   GROUPS BETWEEN nPreceding PRECEDING AND CURRENT ROW)`.
    * At the group level GROUPS ≡ ROWS, so: aggregate per (part, ord)
    * group, run the ROWS frame over groups, join the group-frame sum
    * back to every member row. */
  def groupsSum(df: DataFrame, partCols: Seq[String], orderCol: String,
      valueCol: String, nPreceding: Int, out: String): DataFrame = {
    val keys = partCols :+ orderCol
    val g = df.groupBy(keys.map(col): _*)
      .agg(sum(col(valueCol)).as("__gsum"))
    val w = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rowsBetween(-nPreceding.toLong, Window.currentRow)
    val gw = g.withColumn(out, sum(col("__gsum")).over(w)).drop("__gsum")
    df.join(broadcast(gw), keys)
  }

  /** `sum(value) OVER (PARTITION BY part ROWS BETWEEN UNBOUNDED
    *   PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW)`.
    * Partition total minus the row's own value; None (SQL NULL) when
    * the excluded frame is empty (single-row partition), matching the
    * ANSI contract. */
  def sumExcludeCurrentRow(df: DataFrame, partCols: Seq[String],
      valueCol: String, out: String): DataFrame = {
    val w = Window.partitionBy(partCols.map(col): _*)
    df.withColumn("__tot", sum(col(valueCol)).over(w))
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn(out,
        when(col("__cnt") === 1, lit(null))
          .otherwise(col("__tot") - col(valueCol)))
      .drop("__tot", "__cnt")
  }

  /** `sum(value) OVER (PARTITION BY part ORDER BY ord RANGE BETWEEN
    *   UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE GROUP)`.
    * The inclusive RANGE frame already contains the full peer group
    * (every row tied on ord), so subtracting the peer-group sum
    * leaves exactly the strictly-earlier groups. NULL when no
    * earlier group exists (first ord value in the partition) — the
    * emptiness test compares running vs peer-group COUNTS, so it is
    * value-sign-agnostic. */
  def runningSumExcludeGroup(df: DataFrame, partCols: Seq[String],
      orderCol: String, valueCol: String, out: String): DataFrame = {
    val run = Window.partitionBy(partCols.map(col): _*).orderBy(col(orderCol))
      .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    val peers = Window.partitionBy((partCols :+ orderCol).map(col): _*)
    df.withColumn("__run", sum(col(valueCol)).over(run))
      .withColumn("__runN", count(lit(1)).over(run))
      .withColumn("__grp", sum(col(valueCol)).over(peers))
      .withColumn("__grpN", count(lit(1)).over(peers))
      .withColumn(out,
        when(col("__runN") === col("__grpN"), lit(null))
          .otherwise(col("__run") - col("__grp")))
      .drop("__run", "__runN", "__grp", "__grpN")
  }
}
