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

  /** SCD2 validity intervals (q194) — the slowly-changing-dimension
    * build every warehouse ingest runs: per user, consecutive events
    * with the SAME event_type collapse into one validity interval
    * [effective_from, effective_to), where effective_to is the next
    * DIFFERENT state's start (the last run per user stays open,
    * effective_to NULL). Gaps-and-islands spelling: run id = global
    * row_number − per-state row_number over the same (ts, event_id)
    * order (both windows partition by user_id, so one exchange feeds
    * both sorts — HashPartitioning(user_id) satisfies the
    * (user_id, event_type) clustering), runs close via lead() over
    * (from_us, first event id) — the run-START tie-break keeps equal-µs
    * runs deterministic. Census per state: interval count, closed
    * count, and closed-interval duration mass in integer µs (no
    * float path anywhere).
    *
    * Scale shape: every window partitions by user_id — key-parallel,
    * no global sort, one shuffle; state cardinality never exceeds the
    * event count and the census is an O(states) aggregate. At 100 TB
    * this is the q139/q122 shape: users hash across executors. */
  def q194Scd2Intervals(s: SparkSession, dir: String): DataFrame = {
    // order by (us, event_id), not raw ts: both engines then sort the
    // IDENTICAL µs integers (events.ts is ns in the lake; DuckDB would
    // otherwise order sub-µs neighbors by ns while Spark ties on id)
    val wAll = Window.partitionBy(col("user_id"))
      .orderBy(col("us").asc, col("event_id").asc)
    val wState = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("us").asc, col("event_id").asc)
    val runs = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts").cast("timestamp_ltz")).as("us"),
        col("event_id"))
      .withColumn("rn", row_number().over(wAll))
      .withColumn("grp", col("rn") - row_number().over(wState))
      .groupBy(col("user_id"), col("event_type"), col("grp"))
      // tie-break on the run's FIRST event id (min_by rn — the id at
      // the minimal (us, event_id)), NOT min(event_id) over the run:
      // with equal-µs run starts and non-monotone ids, a later run
      // could hold the smaller id and lead() would close intervals in
      // an order the streaming fold (q196, strict (us, id) order)
      // never produces — run-START order is the one order both builds
      // share
      .agg(min(col("us")).as("from_us"),
        min_by(col("event_id"), col("rn")).as("first_eid"))
    val wRun = Window.partitionBy(col("user_id"))
      .orderBy(col("from_us").asc, col("first_eid").asc)
    runs.withColumn("to_us", lead(col("from_us"), 1).over(wRun))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("intervals"),
        sum(when(col("to_us").isNull, 0L).otherwise(1L)).as("closed"),
        sum(col("to_us") - col("from_us")).as("dur_us_sum"),
        max(col("to_us") - col("from_us")).as("dur_us_max"))
  }
  /** q194's census over an arbitrary events relation — parameterized
    * so the q226 RTBF oracle can pass the live-users subquery (the
    * q216/q223 live-predicate pattern). */
  def q194SqlFrom(from: String): String =
    s"""WITH e AS (
      |  SELECT user_id, event_type, event_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us,
      |         row_number() OVER (PARTITION BY user_id
      |                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC,
      |                                     event_id ASC) AS rn,
      |         row_number() OVER (PARTITION BY user_id, event_type
      |                            ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) ASC,
      |                                     event_id ASC) AS rns
      |  FROM $from),
      |runs AS (
      |  SELECT user_id, event_type, rn - rns AS grp, min(us) AS from_us,
      |         arg_min(event_id, rn) AS first_eid
      |  FROM e GROUP BY 1, 2, 3),
      |scd AS (
      |  SELECT user_id, event_type, from_us,
      |         lead(from_us) OVER (PARTITION BY user_id
      |                             ORDER BY from_us ASC, first_eid ASC) AS to_us
      |  FROM runs)
      |SELECT event_type, count(*) AS intervals,
      |       CAST(sum(CASE WHEN to_us IS NULL THEN 0 ELSE 1 END) AS BIGINT)
      |         AS closed,
      |       CAST(sum(to_us - from_us) AS BIGINT) AS dur_us_sum,
      |       CAST(max(to_us - from_us) AS BIGINT) AS dur_us_max
      |FROM scd GROUP BY 1""".stripMargin

  val q194Sql: String = q194SqlFrom("events")
}
