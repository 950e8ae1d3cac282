package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join: for every left row, attach the payload of
  * the latest right row with the same key and `rightTs <= leftTs`.
  *
  * Spark has no native ASOF JOIN; the naive range-join formulation
  * (`l.key = r.key AND r.ts <= l.ts` + keep max) explodes to a
  * per-key cross product before pruning. This operator instead uses
  * the union + ordered-window pattern: tag both sides, union on a
  * common shape, sort each key partition by (ts, side) with right
  * rows first, and carry the last non-null right payload forward.
  *
  * Scale shape: ONE shuffle keyed by `keyCols` plus a per-partition
  * sort — cost O((|L|+|R|) log) regardless of match fan-out, the same
  * asymptotics a native as-of merge join would have. Skewed keys are
  * handled by AQE the same as any keyed shuffle.
  *
  * Contract: right rows must be unique per (key, rightTs) — otherwise
  * "the" matched row is ambiguous; pre-aggregate the right side
  * (callers in graft.queries do). Left rows with no earlier right row
  * get a null payload (left-outer semantics, matching SQL
  * `ASOF LEFT JOIN`).
  */
object AsofJoin {

  /** @param payload the right-side columns to attach (everything else
    *                on the right is dropped); names must not collide
    *                with left column names.
    * @param direction `backward` (default): latest right row with
    *                rts ≤ lts — the SQL ASOF contract. `forward`:
    *                earliest right row with rts ≥ lts (the "next
    *                reading" join). Both inclusive at equality.
    * @param toleranceSeconds max |lts - rts|; a match older (or,
    *                forward, farther ahead) than this is nulled —
    *                pandas merge_asof's `tolerance`. Same single-
    *                shuffle plan: the bound is applied to the carried
    *                match, never by widening the join. Units: seconds
    *                for timestamp/date ts columns; for numeric ts
    *                columns (epoch millis/seconds/sequence numbers)
    *                the bound is in the column's own units — raw
    *                subtraction, never `unix_timestamp` (which would
    *                string-parse a numeric column to null and silently
    *                drop every match). */
  def asofLeft(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payload: Seq[String],
      direction: String = "backward",
      toleranceSeconds: Option[Long] = None): DataFrame = {
    require(keyCols.nonEmpty, "as-of join requires at least one equi-key")
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got $direction")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"right payload ${payload.intersect(leftCols)} collides with left columns")

    // the carried right value includes its own event time so a
    // staleness bound can be applied to the match afterwards
    val rCarryType = org.apache.spark.sql.types.StructType(
      right.select(col(rightTsCol).as("__rts") +: payload.map(col): _*)
        .schema.fields)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        col(leftTsCol).as("__ts"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rCarryType).as("__r")): _*)
    val lType = lTagged.schema("__l").dataType
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(col(rightTsCol).as("__rts") +: payload.map(col): _*)
          .as("__r")): _*)

    // backward: ascending scan, right rows first at equal ts, carry the
    // LAST right seen = latest rts ≤ lts. forward: descending scan with
    // the same tie order = earliest rts ≥ lts. Equality inclusive both
    // ways.
    val order =
      if (direction == "backward") col("__ts").asc else col("__ts").desc
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(order, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    val matched = lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val bounded = toleranceSeconds match {
      case None => matched
      case Some(tol) =>
        import org.apache.spark.sql.types._
        // timestamp → fractional epoch seconds via a double cast, NOT
        // unix_timestamp (which truncates to whole seconds and
        // mis-decides sub-second gaps at the bound)
        val diff = matched.schema("__ts").dataType match {
          case _: NumericType =>
            abs(col("__ts") - col("__match.__rts"))
          case TimestampType | TimestampNTZType =>
            abs(col("__ts").cast("double") -
              col("__match.__rts").cast("double"))
          case DateType =>
            abs(col("__ts").cast("timestamp").cast("double") -
              col("__match.__rts").cast("timestamp").cast("double"))
          case other => throw new IllegalArgumentException(
            s"asofLeft tolerance requires numeric or timestamp ts columns, got $other")
        }
        matched.withColumn("__match", when(diff <= tol, col("__match")))
    }
    bounded.select(
      leftCols.map(c => col(s"__l.$c").as(c)) ++
        payload.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** Salted as-of join for HOT keys — the straggler fix SCALE.md flags
    * for [[asofLeft]]: with few distinct keys (or one dominant key),
    * the single window partition per key serializes onto one task.
    *
    * Left rows scatter into `numSalts` buckets (hashed on the left
    * timestamp for an even spread); right rows REPLICATE into every
    * bucket, so each (key, salt) partition still sees the full right
    * history and the forward-fill result is row-for-row identical to
    * the unsalted operator (AsofJoinSpec asserts equivalence).
    *
    * Cost model: right side inflates ×numSalts — the right trade when
    * |R| ≪ |L| (dimension-history vs event firehose, the canonical
    * as-of shape). Parallelism per key: 1 → numSalts. */
  def asofLeftSalted(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTsCol: String,
      rightTsCol: String,
      payload: Seq[String],
      numSalts: Int = 16): DataFrame = {
    require(numSalts >= 1, "numSalts must be positive")
    require(keyCols.nonEmpty, "as-of join requires at least one equi-key")
    val leftCols = left.columns.toSeq
    require(payload.intersect(leftCols).isEmpty,
      s"right payload ${payload.intersect(leftCols)} collides with left columns")

    val rPayloadType = org.apache.spark.sql.types.StructType(
      right.select(payload.map(col): _*).schema.fields)
    val lTagged = left.select(
      keyCols.map(col) ++ Seq(
        pmod(hash(col(leftTsCol)), lit(numSalts)).as("__salt"),
        col(leftTsCol).as("__ts"),
        lit(1).as("__side"),
        struct(leftCols.map(col): _*).as("__l"),
        lit(null).cast(rPayloadType).as("__r")): _*)
    val lType = lTagged.schema("__l").dataType
    val rTagged = right.select(
      keyCols.map(col) ++ Seq(
        explode(sequence(lit(0), lit(numSalts - 1))).as("__salt"),
        col(rightTsCol).as("__ts"),
        lit(0).as("__side"),
        lit(null).cast(lType).as("__l"),
        struct(payload.map(col): _*).as("__r")): _*)

    val w = Window
      .partitionBy((keyCols :+ "__salt").map(col): _*)
      .orderBy(col("__ts").asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    lTagged.unionByName(rTagged)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(
        leftCols.map(c => col(s"__l.$c").as(c)) ++
          payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
