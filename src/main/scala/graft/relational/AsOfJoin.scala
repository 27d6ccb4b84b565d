package graft.relational

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left (fact) row, the LATEST right (quote) row
  * of the same key with `rightTime <= leftTime` — the
  * sessionization/market-data operator Spark lacks natively.
  *
  * Implementation is the scalable union-window form, not a range join:
  * tag both sides, union, ONE window pass per key ordered by
  * (time, side, right-id) carrying the last non-null right id forward,
  * keep fact rows. Cost = one shuffle on the key + one sort within
  * partitions — O(n log n) per key group, zero range-explosion, no
  * per-row scans, survives arbitrarily wide time ranges (a broadcast
  * range join degrades quadratically when many quotes precede each
  * fact; this never does). Skewed keys are the same skew the window
  * already has — salt upstream if one key dominates.
  *
  * Tie semantics (documented, deterministic): quotes at exactly
  * `leftTime` qualify (`<=`); among quotes sharing the max qualifying
  * time, the highest `rightId` wins (total order in the window sort).
  */
object AsOfJoin {

  /** @return left rows + `prev_<rightId>` column (null when no quote
    *         at or before the fact's time). */
  def asOf(left: DataFrame, right: DataFrame, key: String,
      leftTime: String, rightTime: String,
      leftId: String, rightId: String): DataFrame = {
    val rightIdType = right.schema(rightId).dataType
    val leftIdType = left.schema(leftId).dataType
    val l = left.select(col(key), col(leftTime).as("_t"),
      col(leftId).as("_lid"),
      lit(null).cast(rightIdType).as("_rid"), lit(1).as("_fact"))
    val r = right.select(col(key), col(rightTime).as("_t"),
      lit(null).cast(leftIdType).as("_lid"),
      col(rightId).as("_rid"), lit(0).as("_fact"))
    // quotes sort before facts at equal time (inclusive <=); _rid last
    // position wins among equal-time quotes (highest id, deterministic)
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_fact").asc, col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("_prev", last(col("_rid"), ignoreNulls = true).over(w))
      .where(col("_fact") === 1)
      .select(col("_lid").as(leftId), col(key),
        col("_prev").as(s"prev_$rightId"))
  }
}
