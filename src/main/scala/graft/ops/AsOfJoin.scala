package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — "for each left row, the most recent right row at or
  * before its timestamp, per key". Spark has no native operator;
  * per the build brief's preference order this is (a) composed from
  * existing ops rather than a custom SparkPlan:
  *
  *   tag both sides → union → per-key window ordered by (ts, side) →
  *   last_value(right payload, ignoreNulls) → keep left rows.
  *
  * Cost model: ONE shuffle on the key (the union is shuffle-free), one
  * per-key sort inside the window — identical to what a dedicated
  * merge-based as-of operator would pay on unsorted input. No row
  * explosion (contrast with the naive range-join + argmax, which
  * materializes every (left, earlier-right) pair before reducing).
  * Skewed keys split via AQE like any window; at 100 TB pre-bucketing
  * both sides by key makes the shuffle disappear entirely
  * (see ScaleSpec bucketing).
  */
object AsOfJoin {

  /** @param left      probe side (one output row per input row)
    * @param right     reference side supplying `payloadCols`
    * @param keyCol    equi-key on both sides
    * @param tsCol     event-time column name on both sides
    * @param payloadCols right-side columns carried to the result
    *                  (null when no right row is at-or-before)
    */
  def leftAsOf(left: DataFrame, right: DataFrame, keyCol: String,
               tsCol: String, payloadCols: Seq[String]): DataFrame = {
    val lCols = left.columns.toSeq
    // The payload travels as ONE struct per right row (null struct for
    // left rows): last(_, ignoreNulls) then selects the most recent
    // right ROW as a unit, so (a) a right row whose payload value is
    // legitimately NULL still wins (field-wise last() would skip it
    // and resurrect an older value — diverging from ASOF semantics)
    // and (b) multiple payload columns can never be stitched together
    // from different right rows.
    val taggedRight = right.select(
      Seq(col(keyCol), col(tsCol), lit(0).as("__side"),
        struct(payloadCols.map(col): _*).as("__p")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol)
          .map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)
    val payloadType = taggedRight.schema("__p").dataType
    val taggedLeft = left.select(
      Seq(col(keyCol), col(tsCol), lit(1).as("__side"),
        lit(null).cast(payloadType).as("__p")) ++
        lCols.filterNot(c => c == keyCol || c == tsCol).map(col): _*)
    // right rows sort BEFORE left rows at equal ts (<= semantics)
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    taggedRight.unionByName(taggedLeft)
      .withColumn("__asof", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select((Seq(col(keyCol), col(tsCol)) ++
        lCols.filterNot(c => c == keyCol || c == tsCol).map(col) ++
        payloadCols.map(c => col(s"__asof.$c").as(c))): _*)
  }
}
