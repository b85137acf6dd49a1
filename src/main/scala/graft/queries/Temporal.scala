package graft.queries

import graft.Tables
import graft.ops.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal operators over the events stream: as-of join and the full
  * window-function family.
  */
object Temporal {

  /** As-of join: for every purchase event, the most recent error event
    * value at-or-before it for the same user (the classic "join each
    * tick to the prevailing quote" shape). Oracle uses DuckDB's native
    * ASOF JOIN — our composed operator must agree with it exactly.
    */
  def q38AsofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("ts"), col("value").as("error_value"))
    AsOfJoin.leftAsOf(purchases, errors, "user_id", "ts", Seq("error_value"))
      .select(col("event_id"), col("user_id"),
        round(col("value"), 2).as("value"),
        round(col("error_value"), 2).as("last_error_value"))
  }
  val q38Sql: String =
    """SELECT p.event_id, p.user_id, round(p.value, 2) AS value,
      |       round(e.value, 2) AS last_error_value
      |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'error') e
      |  ON p.user_id = e.user_id AND e.ts <= p.ts""".stripMargin

  /** The window-function family in one pass over one window frame
    * spec: rank/dense_rank/lag/lead/ntile/running sum. One shuffle on
    * user_id; all six functions share the same sort.
    */
  def q39WindowFamily(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts").asc, col("event_id").asc)
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(s, dir)
      .filter(col("user_id") < 20)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .withColumn("prev_event", lag(col("event_id"), 1).over(w))
      .withColumn("next_event", lead(col("event_id"), 1).over(w))
      .withColumn("quartile", ntile(4).over(w))
      .withColumn("running_value", round(sum(col("value")).over(wRun), 2))
      .drop("value", "ts")
  }
  val q39Sql: String =
    """SELECT user_id, event_id,
      |       row_number() OVER w AS rn,
      |       rank() OVER w AS rnk,
      |       dense_rank() OVER w AS drnk,
      |       lag(event_id) OVER w AS prev_event,
      |       lead(event_id) OVER w AS next_event,
      |       ntile(4) OVER w AS quartile,
      |       round(sum(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_value
      |FROM events WHERE user_id < 20
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)""".stripMargin
}
