package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for every left row, the single right row with the greatest
  * timestamp ≤ the left row's, within the same key. The reference's
  * `latest_sqe` pointer resolution (`src/app.py:1497-1501`) is exactly this
  * lookup (resolve the most recent artifact at query time); generalized, it
  * is the standard event-to-slowly-changing-dimension join Spark has no
  * native operator for.
  *
  * Spark-first plan (union-window trick, not a range self-join):
  *  1. tag both inputs and union them on (key..., ts);
  *  2. ONE shuffle: window per key ordered by (ts, side) with
  *     `last(right_payload, ignoreNulls)` over rows unboundedPreceding..
  *     current — the right payload "carries forward" to every later left
  *     row; right sorts before left at equal ts so `ts_left == ts_right`
  *     matches (the ASOF `>=` convention);
  *  3. keep left rows.
  *
  * A range-condition join (`l.ts >= r.ts`) would explode to |L|·|R| pairs
  * per key before aggregation; this stays |L|+|R| rows through its single
  * shuffle, so it survives keys with millions of rows. Ambiguity contract:
  * multiple right rows on the same (key, ts) resolve to the one latest in
  * the (ts, tie-break columns) sort — callers wanting a pinned choice
  * dedupe the right side first (same caveat as DuckDB/QuestDB ASOF).
  * Null-timestamp right rows are dropped inside the operator (they carry
  * no "as of" instant; SQL ASOF's `>=` comparison never matches them —
  * without the filter they'd sort nulls-first and carry forward as a
  * spurious match for every left row).
  */
object AsOfJoin {

  /** left + `asof` struct column holding the matched right row (null when
    * no right row is at-or-before). Both inputs need `keyCols` and `tsCol`;
    * the right side's non-key columns travel inside the struct. */
  def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String): DataFrame = {
    val rightPayloadCols = right.columns.filterNot(keyCols.contains).toSeq
    val payload = struct(rightPayloadCols.map(col): _*)
    val leftCols = left.columns.toSeq

    val taggedRight = right
      .filter(col(tsCol).isNotNull) // enforce the null-ts contract (scaladoc)
      .select(keyCols.map(col) :+ col(tsCol).as("_ts") :+ lit(0).as("_side")
        :+ payload.as("_r"): _*)
    val rType = taggedRight.schema("_r").dataType
    val taggedLeft = left
      .select(keyCols.map(col) :+ col(tsCol).as("_ts") :+ lit(1).as("_side")
        :+ lit(null).cast(rType).as("_r")
        :+ struct(leftCols.map(col): _*).as("_l"): _*)

    val unioned = taggedRight.withColumn("_l",
        lit(null).cast(taggedLeft.schema("_l").dataType))
      .unionByName(taggedLeft)

    // _r as the final sort key pins the choice among right rows sharing
    // (key, ts): the struct-greatest payload wins deterministically (left
    // rows all carry null _r, so their relative order is immaterial —
    // every equal-ts left row still sees every equal-ts right row, which
    // sort strictly before side 1)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("_ts").asc, col("_side").asc, col("_r").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("asof", last(col("_r"), ignoreNulls = true).over(w))
      .filter(col("_side") === 1)
      .select(leftCols.map(c => col("_l").getField(c).as(c)) :+ col("asof"): _*)
  }
}
