package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-time analytics over the `events` table — the capabilities the
  * reference README claims ("Fenêtrage temporel", stateful processing;
  * reference ReadMe.md:119-121) but never implements (SURVEY.md §2.5).
  * Batch forms here (oracle-checkable); the streaming forms with
  * watermarks live in [[graft.streaming.Streams]] and run the same
  * logic via readStream.
  *
  * events.ts is ns-precision parquet; Spark truncates to µs on read.
  * Oracles CAST to µs TIMESTAMP first so both engines bucket the same
  * instants.
  */
object Events {

  /** Tumbling 1-hour window aggregate (window() + multi-measure agg).
    * Emitted as epoch seconds — timestamp formatting differences can't
    * affect the oracle hash.
    */
  def q16HourlyEventStats(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("event_count"),
        round(sum(col("value")), 2).as("total_value"))
      .select(unix_timestamp(col("w.start")).as("hour_start"),
        col("event_type"), col("event_count"), col("total_value"))
  }
  val q16Sql: String =
    """SELECT CAST(epoch(date_trunc('hour', CAST(ts AS TIMESTAMP))) AS BIGINT) AS hour_start,
      |       event_type, count(*) AS event_count,
      |       round(sum(value), 2) AS total_value
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Sessionization: per-user sessions split on >30 min inactivity
    * gaps — lag window to flag session starts, running sum to assign
    * session ids, then per-user session stats. The batch twin of
    * streaming session_window; one shuffle on user_id, both window
    * functions share the same (user_id, ts) sort.
    */
  def q17UserSessions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      // ts arrives TIMESTAMP_NTZ from driver-written parquet (timestamp[us],
      // no tz) and Spark 4 forbids NTZ→DOUBLE; route through timestamp_ltz
      // (session tz is UTC). INTEGER micros, not double seconds: a
      // double-epoch diff carries ~1e-7 s rounding at 2026 magnitudes,
      // which can split an exactly-1800s gap that the µs-exact stateful
      // sessionizers (StatefulSessions) merge — the batch/stream parity
      // contract requires the same integer arithmetic on both sides.
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp_ltz")) -
            unix_micros(col("prev_ts").cast("timestamp_ltz")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("events_in_session"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("session_count"),
        max(col("events_in_session")).as("max_session_events"))
  }
  /** q17's census over an arbitrary events relation — parameterized so
    * the q223 RTBF oracle can pass the live-users subquery (the q216
    * live-predicate pattern). */
  def q17SqlFrom(from: String): String =
    s"""WITH flagged AS (
      |  SELECT user_id, ts,
      |         -- epoch_us, not epoch: integer micros match Spark's
      |         -- unix_micros exactly; double seconds round at ~1e-7 s
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP)) - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP)) > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM $from WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |sessions AS (
      |  SELECT user_id,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |per_session AS (
      |  SELECT user_id, session_id, count(*) AS events_in_session
      |  FROM sessions GROUP BY 1, 2)
      |SELECT user_id, count(*) AS session_count,
      |       max(events_in_session) AS max_session_events
      |FROM per_session GROUP BY 1""".stripMargin

  val q17Sql: String = q17SqlFrom("events")

  /** Schema-on-read JSON decode (reference F2, Consumer.scala:59): the
    * props payload is parsed with from_json against a declared schema;
    * the extracted field drives a bucketed group-count. Oracle uses
    * regexp (DuckDB JSON extension may be unavailable offline) — same
    * values either way.
    */
  def q18PropsBuckets(s: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val propsSchema = StructType(Seq(StructField("k", IntegerType)))
    Tables.events(s, dir)
      .withColumn("k", from_json(col("props"), propsSchema).getField("k"))
      .filter(col("k").isNotNull)
      .withColumn("k_bucket", (col("k") % 10).cast("int"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("event_count"), max(col("k")).as("max_k"))
  }
  val q18Sql: String =
    """SELECT CAST(CAST(regexp_extract(props, '(\d+)', 1) AS INTEGER) % 10 AS INTEGER) AS k_bucket,
      |       count(*) AS event_count,
      |       max(CAST(regexp_extract(props, '(\d+)', 1) AS INTEGER)) AS max_k
      |FROM events WHERE regexp_extract(props, '(\d+)', 1) <> ''
      |GROUP BY 1""".stripMargin

  /** Exact stream-style dedup, batch form: first event per
    * (user_id, event_type) by time — dropDuplicates ordering is
    * nondeterministic, so the deterministic min-by shape is used;
    * the streaming twin (dropDuplicatesWithinWatermark) is in
    * graft.streaming.
    */
  def q19FirstEventPerUserType(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(min(col("event_id")).as("first_event_id"),
        count(lit(1)).as("occurrences"))
  }
  val q19Sql: String =
    """SELECT user_id, event_type, min(event_id) AS first_event_id,
      |       count(*) AS occurrences
      |FROM events GROUP BY 1, 2""".stripMargin

  /** Ordered funnel analysis (q69): per user, first `view`, then the
    * first `click` strictly AFTER that view, then the first `purchase`
    * strictly after that click — the product-analytics staple
    * (ClickHouse windowFunnel / Amplitude funnels) in staged
    * relational form. Each stage filters to ONE event type scan-side
    * before its user_id shuffle, so the three exchanges together move
    * about as many rows as one unfiltered pass; the stage joins are
    * user_id-aligned aggregations an AQE cluster co-partitions. At
    * 100 TB you'd pre-bucket events by user_id and all three stages
    * become shuffle-free.
    */
  def q69Funnel(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("ts"))
    val v = e.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts")).as("tv"))
    val c = e.filter(col("event_type") === "click").join(v, "user_id")
      .filter(col("ts") > col("tv"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tc"))
    val p = e.filter(col("event_type") === "purchase").join(c, "user_id")
      .filter(col("ts") > col("tc"))
      .groupBy(col("user_id")).agg(min(col("ts")).as("tp"))
    e.agg(countDistinct(col("user_id")).as("n_users"))
      .crossJoin(v.agg(count(lit(1)).as("n_view")))
      .crossJoin(c.agg(count(lit(1)).as("n_click_after_view")))
      .crossJoin(p.agg(count(lit(1)).as("n_purchase_after_click")))
  }
  val q69Sql: String =
    """WITH v AS (
      |  SELECT user_id, min(CAST(ts AS TIMESTAMP)) AS tv
      |  FROM events WHERE event_type = 'view' GROUP BY 1),
      |c AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tc
      |  FROM events e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'click' AND CAST(e.ts AS TIMESTAMP) > v.tv
      |  GROUP BY 1),
      |p AS (
      |  SELECT e.user_id, min(CAST(e.ts AS TIMESTAMP)) AS tp
      |  FROM events e JOIN c ON e.user_id = c.user_id
      |  WHERE e.event_type = 'purchase' AND CAST(e.ts AS TIMESTAMP) > c.tc
      |  GROUP BY 1)
      |SELECT (SELECT count(DISTINCT user_id) FROM events) AS n_users,
      |       (SELECT count(*) FROM v) AS n_view,
      |       (SELECT count(*) FROM c) AS n_click_after_view,
      |       (SELECT count(*) FROM p) AS n_purchase_after_click""".stripMargin

  /** Cohort retention (q82) — the classic product-analytics rollup:
    * users are cohorted by the week of their FIRST event, and each
    * cohort's activity is counted k weeks later. Week indices are
    * pure integer arithmetic (FLOORED epoch seconds div 86400 div 7);
    * the oracle floors via epoch_us // 1e6 — DuckDB's epoch() returns
    * DOUBLE and CAST rounds half-up, which would flip an event in the
    * last half-second of a week into the next bucket (Spark's
    * unix_timestamp truncates).
    *
    * Data invariant: ts >= 1970-01-01 (epoch seconds non-negative).
    * The week bucket uses Spark `div` (truncates toward zero) vs
    * DuckDB `//` (floors) — they agree only on non-negative epochs;
    * a pre-1970 timestamp would land in different buckets per engine.
    * The events table is generated post-2020 so the invariant holds.
    *
    * Scale shape: two user-keyed hash-aggs off one scan (the cohort
    * min and the distinct active (user, week) set — both reduce the
    * event log to O(users) rows), a join on user_id (co-partitioned
    * by the aggs' own shuffles under AQE), and a tiny
    * (cohort, week_k) rollup; cohort sizes broadcast back. The event
    * log is never shuffled twice.
    */
  def q82CohortRetention(s: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(s, dir)
      .select(col("user_id"),
        expr("unix_timestamp(ts) div 86400 div 7").as("wk"))
    val cohort = e.groupBy(col("user_id")).agg(min(col("wk")).as("cohort_wk"))
    val active = e.distinct()
    val ret = active.join(cohort, "user_id")
      .withColumn("week_k", col("wk") - col("cohort_wk"))
      .groupBy(col("cohort_wk"), col("week_k"))
      // rows are already distinct per (user, wk) and wk is functionally
      // (cohort_wk, week_k) — plain count avoids a distinct-agg Expand
      .agg(count(lit(1)).as("active_users"))
    val sizes = cohort.groupBy(col("cohort_wk"))
      .agg(count(lit(1)).as("cohort_size"))
    ret.join(broadcast(sizes), "cohort_wk")
      .withColumn("retention_pct",
        expr("active_users * 100 div cohort_size"))
  }
  val q82Sql: String =
    """WITH e AS (
      |  SELECT user_id,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 86400 // 7 AS wk
      |  FROM events),
      |c AS (SELECT user_id, min(wk) AS cohort_wk FROM e GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, wk FROM e),
      |r AS (
      |  SELECT c.cohort_wk, a.wk - c.cohort_wk AS week_k,
      |         count(*) AS active_users
      |  FROM a JOIN c ON a.user_id = c.user_id GROUP BY 1, 2),
      |s AS (SELECT cohort_wk, count(*) AS cohort_size FROM c GROUP BY 1)
      |SELECT r.cohort_wk, r.week_k, r.active_users, s.cohort_size,
      |       r.active_users * 100 // s.cohort_size AS retention_pct
      |FROM r JOIN s ON r.cohort_wk = s.cohort_wk""".stripMargin

  /** Event-type transition matrix (q83) — first-order Markov counts
    * over each user's event sequence (the session-flow / funnel-
    * discovery census): consecutive (type → next type) pairs ordered
    * by (ts, event_id) — the event_id tie-break makes the sequence a
    * total order, so `lead` is deterministic on both engines.
    *
    * Scale shape: ONE shuffle (hash on user_id for the lead window;
    * the sort is partition-local), then the (from, to) rollup is
    * 16 cells; per-from totals ride a broadcast join back for the
    * row-normalized percentages.
    */
  def q83TransitionMatrix(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val pairs = Tables.events(s, dir)
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transitions"))
    val totals = pairs.groupBy(col("from_type"))
      .agg(sum(col("transitions")).as("from_total"))
    pairs.join(broadcast(totals), "from_type")
      .withColumn("pct_of_from",
        expr("transitions * 100 div from_total"))
      .select(col("from_type"), col("to_type"),
        col("transitions"), col("pct_of_from"))
  }
  val q83Sql: String =
    """WITH seq AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER (PARTITION BY user_id
      |                                ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |p AS (
      |  SELECT from_type, to_type, count(*) AS transitions
      |  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2),
      |t AS (SELECT from_type, CAST(sum(transitions) AS BIGINT) AS from_total
      |      FROM p GROUP BY 1)
      |SELECT p.from_type, p.to_type, p.transitions,
      |       p.transitions * 100 // t.from_total AS pct_of_from
      |FROM p JOIN t ON p.from_type = t.from_type""".stripMargin

  // ------------------------------------------------- rate anomaly

  /** Trailing-window length (hours) and minimum baseline for a verdict. */
  val AnomBaseHours = 24
  val AnomMinBase = 12L
  /** z² threshold: flag when (x−μ)² > AnomZsq·σ², i.e. |z| > 3. */
  val AnomZsq = 9L

  /** Rolling z-score anomaly on hourly event rates (q90) — the ingest
    * monitor a pipeline runs over its own telemetry: per event type,
    * each hour's count is judged against the trailing
    * [[AnomBaseHours]]-hour baseline; hours with fewer than
    * [[AnomMinBase]] baseline rows abstain.
    *
    * INTEGER z-score: the naive |x−μ|>3σ needs μ=S/n and σ=√(...) —
    * doubles whose rounding could flip a verdict between engines.
    * Multiply through instead: with S=Σcnt, Q=Σcnt², n over the
    * window, (x−S/n)² > 9·(nQ−S²)/n²  ⟺  (n·x−S)² > 9·(n·Q−S²) —
    * every operand integral, so the verdict is bit-exact on both
    * engines and the column hash-matches (the q37-booleans idea,
    * without its tolerance epsilon).
    *
    * Scale shape: the corpus-wide stage is the hourly hash-agg
    * (O(events) → O(types·hours) rows); the window runs over that
    * tiny table. Its PARTITION BY event_type has only a few
    * partitions — fine here because the windowed table is ~10⁴ rows
    * per year regardless of corpus size; if types were many and
    * hours deep you'd range-partition (type, day) with a 24-row tail
    * overlap instead.
    */
  /** Hourly (hour_start, event_type, cnt) counts of an events frame —
    * SUM-mergeable across any partition of the event log, which is
    * what makes the streaming twin (Streams.incrementalHourlyCounts)
    * a per-batch-partials op; shared verbatim with it. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .groupBy(
        (expr("unix_timestamp(ts) div 3600") * 3600L).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"))

  /** The UPGRADED hourly fold (q228's pipeline v2): same keys and cnt,
    * plus the integer-cents value mass — the column a monitoring
    * pipeline grows mid-life. Same hour derivation as [[hourlyCounts]]
    * so v1 and v2 partials merge on identical keys. */
  def hourlyCountsWithValue(events: DataFrame): DataFrame =
    events
      .groupBy(
        (expr("unix_timestamp(ts) div 3600") * 3600L).as("hour_start"),
        col("event_type"))
      .agg(count(lit(1)).as("cnt"),
        sum(floor(col("value") * 100).cast("long")).as("value_cents"))

  /** The verdict window over an hourly-counts frame — shared by batch
    * q90 and the streaming snapshot so the two can never drift. */
  def anomalyVerdicts(hourly: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("hour_start"))
      .rowsBetween(-AnomBaseHours, -1)
    hourly
      .withColumn("base_n", count(lit(1)).over(w))
      .withColumn("s", sum(col("cnt")).over(w))
      .withColumn("q", sum(col("cnt") * col("cnt")).over(w))
      .select(col("event_type"), col("hour_start"), col("cnt"), col("base_n"),
        (col("base_n") >= AnomMinBase &&
          (col("base_n") * col("cnt") - col("s")) *
            (col("base_n") * col("cnt") - col("s")) >
            lit(AnomZsq) * (col("base_n") * col("q") - col("s") * col("s")))
          .as("anomaly"))
  }

  def q90RateAnomaly(s: SparkSession, dir: String): DataFrame =
    anomalyVerdicts(hourlyCounts(Tables.events(s, dir)))
  val q90Sql: String =
    s"""WITH hourly AS (
       |  -- epoch() is DOUBLE and `//` on DOUBLE degenerates to `/` in
       |  -- DuckDB (no flooring!) — floor explicitly, then the integer
       |  -- hour matches Spark's unix_timestamp div exactly (ts >= 1970)
       |  SELECT CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 3600) AS BIGINT) * 3600
       |           AS hour_start,
       |         event_type, count(*) AS cnt
       |  FROM events GROUP BY 1, 2),
       |win AS (
       |  SELECT event_type, hour_start, cnt,
       |         count(*) OVER w AS base_n,
       |         sum(cnt) OVER w AS s,
       |         sum(cnt * cnt) OVER w AS q
       |  FROM hourly
       |  WINDOW w AS (PARTITION BY event_type ORDER BY hour_start
       |               ROWS BETWEEN $AnomBaseHours PRECEDING AND 1 PRECEDING))
       |SELECT event_type, CAST(hour_start AS BIGINT) AS hour_start, cnt, base_n,
       |       (base_n >= $AnomMinBase AND
       |        (base_n * cnt - s) * (base_n * cnt - s) >
       |          $AnomZsq * (base_n * q - s * s)) AS anomaly
       |FROM win""".stripMargin

  /** Behavioral k-anonymity census (q101) — the privacy-audit rung
    * next to q76's PII scrub: before releasing event data (or training
    * on it), measure how re-identifiable users are from their behavior
    * alone. Each user's signature is the multiset of their event-type
    * counts (canonicalized: sorted "type:count" terms, md5'd); the
    * census reports, per anonymity-set size k, how many signatures and
    * users share a signature with exactly k users. k = 1 is the risk
    * mass: users whose behavioral shape is unique in the corpus.
    *
    * Scale: two corpus hash-aggs ((user, type) → user) and a
    * signature agg over O(users) rows — shuffle-minimal by
    * construction; the census output is O(distinct k), trivially
    * small. Nothing pairwise: anonymity sets come from grouping, not
    * user-to-user comparison. */
  def q101ReidRisk(s: SparkSession, dir: String): DataFrame = {
    // NULL event_type gets an explicit sentinel term: concat_ws would
    // silently DROP the null (keeping a bare count) while DuckDB's
    // `||` would null the whole term — coalesce on both sides keeps
    // the signatures engine-identical and null-counting
    // each "type:count" term is md5'd BEFORE aggregation: a raw
    // event_type containing ':' or '|' could otherwise collide two
    // distinct count-multisets into one signature and undercount the
    // k=1 re-identification mass — fixed-width hex terms can't
    val sig = Tables.events(s, dir)
      .groupBy(col("user_id"),
        coalesce(col("event_type"), lit("<null>")).as("et"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("user_id"))
      .agg(md5(concat_ws("|",
        sort_array(collect_list(
          md5(concat_ws(":", col("et"), col("c")).cast("binary")))))
        .cast("binary")).as("sig"))
    sig.groupBy(col("sig")).agg(count(lit(1)).as("k"))
      .groupBy(col("k"))
      .agg(count(lit(1)).as("signatures"),
        (col("k") * count(lit(1))).as("users"))
  }
  val q101Sql: String =
    """WITH pc AS (
      |  SELECT user_id, coalesce(event_type, '<null>') AS et, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |sig AS (
      |  SELECT user_id,
      |         md5(string_agg(md5(et || ':' || c), '|'
      |               ORDER BY md5(et || ':' || c))) AS sig
      |  FROM pc GROUP BY 1),
      |anon AS (SELECT sig, count(*) AS k FROM sig GROUP BY 1)
      |SELECT k, count(*) AS signatures, CAST(k * count(*) AS BIGINT) AS users
      |FROM anon GROUP BY 1""".stripMargin

  /** q18's census through Spark 4's VARIANT type (q118): props parsed
    * once into the binary variant encoding (try_parse_json — malformed
    * rows become NULL, the PERMISSIVE contract), fields extracted with
    * variant_get path expressions. Same answer as q18's fixed-schema
    * from_json — the difference is the 100 TB posture: a variant
    * column is parsed ONCE at ingest and every later query
    * path-extracts from the binary encoding (with shredding, straight
    * from columnar storage) instead of re-running a JSON parser per
    * query per row, and schema drift (new fields) needs no schema
    * migration. Oracle: the same SQL as q18; a differential spec pins
    * the two paths row-equal.
    */
  def q118VariantProps(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .withColumn("v", try_parse_json(col("props")))
      .withColumn("k", expr("variant_get(v, '$.k', 'int')"))
      .filter(col("k").isNotNull)
      .withColumn("k_bucket", (col("k") % 10).cast("int"))
      .groupBy(col("k_bucket"))
      .agg(count(lit(1)).as("event_count"), max(col("k")).as("max_k"))
  }

  /** Inter-event gap spectrum (q109): per event_type, a log2-bucketed
    * histogram of the µs gap since the same user's PREVIOUS event (any
    * type) — the arrival-cadence fingerprint behind bot detection and
    * session-gap tuning (a 30-min sessionization cut is bucket ~40;
    * this census shows what the cut actually splits). The gap is
    * attributed to the LATER event's type ("what arrives after
    * silence"). Bucket = floor(log2(gap_us)) spelled as
    * length(bin(gap)) - 1 — pure integer/string arithmetic, identical
    * in both engines (no float log2 whose half-ulp at exact powers of
    * two could flip a bucket); gaps of 0 and 1 µs share bucket 0.
    *
    * Scale shape: one shuffle on user_id for the lag window (same
    * sort the q17 sessionization rides — in a multi-query plan the
    * exchange is reusable), then a hash-agg to O(types × 64) cells.
    * µs-exact integer arithmetic via unix_micros, per the q17/NTZ
    * discipline.
    */
  def q109IntereventGaps(s: SparkSession, dir: String): DataFrame = {
    // event_id tie-break: the gap VALUES are tie-order invariant, but
    // the event_type each gap is attributed to is not — both engines
    // must walk equal-µs events in the same order
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("gap_us",
        unix_micros(col("ts").cast("timestamp_ltz")) -
          unix_micros(lag(col("ts"), 1).over(byUser).cast("timestamp_ltz")))
      .filter(col("gap_us").isNotNull)
      .withColumn("gap_bucket", (length(bin(col("gap_us"))) - 1).cast("int"))
      .groupBy(col("event_type"), col("gap_bucket"))
      .agg(count(lit(1)).as("gap_count"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
  }
  /** Session-scoped co-occurrence lift (q120): the market-basket
    * census over behavioral sessions — for every unordered pair of
    * event types, in how many q17 sessions do both occur, and the
    * LIFT n·c(a,b)/(c(a)·c(b)) in integer ppm (1e6 = independence;
    * above = the types travel together within a session, below =
    * they repel). The association signal product analytics reads
    * before building any recommendation — computed on the SAME
    * session cut q17/q113 pin, so the lift table and the session
    * census can never disagree about what a session is.
    *
    * Scale shape: one user_id shuffle for the session window (the
    * q17 sort again), a hash-agg to distinct (session, type) —
    * O(sessions × types) rows — and the pair join runs on THAT
    * compacted frame keyed by session id: with T event types a
    * session contributes ≤ C(T,2) pairs (T=5 here), so the join
    * output is bounded by 10× sessions, never corpus². The 1-row
    * session-total and per-type frames broadcast into the lift
    * arithmetic.
    */
  def q120SessionLift(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
    val st = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp_ltz")) -
            unix_micros(col("prev_ts").cast("timestamp_ltz")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(concat_ws(":", col("user_id"), col("session_id")).as("sid"),
        col("event_type").as("t"))
      .distinct()
    val n = st.select(col("sid")).distinct()
      .agg(count(lit(1)).as("n_sessions"))
    val ct = st.groupBy(col("t")).agg(count(lit(1)).as("c"))
    val a = st.select(col("sid"), col("t").as("type_a"))
    val b = st.select(col("sid"), col("t").as("type_b"))
    a.join(b, Seq("sid")).filter(col("type_a") < col("type_b"))
      .groupBy(col("type_a"), col("type_b"))
      .agg(count(lit(1)).as("both_sessions"))
      .join(broadcast(ct.select(col("t").as("type_a"), col("c").as("ca"))),
        Seq("type_a"))
      .join(broadcast(ct.select(col("t").as("type_b"), col("c").as("cb"))),
        Seq("type_b"))
      .crossJoin(broadcast(n))
      .select(col("type_a"), col("type_b"), col("both_sessions"),
        expr("both_sessions * n_sessions * 1000000 div (ca * cb)")
          .as("lift_ppm"))
  }
  val q120Sql: String =
    """WITH flagged AS (
      |  SELECT user_id, ts, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP))
      |                   - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
      |                   > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
      |st AS (
      |  SELECT DISTINCT user_id || ':' || sum(new_session)
      |           OVER (PARTITION BY user_id ORDER BY ts
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS sid,
      |         event_type AS t
      |  FROM flagged),
      |n AS (SELECT count(DISTINCT sid) AS n_sessions FROM st),
      |ct AS (SELECT t, count(*) AS c FROM st GROUP BY 1),
      |pairs AS (
      |  SELECT a.t AS type_a, b.t AS type_b, count(*) AS both_sessions
      |  FROM st a JOIN st b ON a.sid = b.sid AND a.t < b.t
      |  GROUP BY 1, 2)
      |SELECT type_a, type_b, both_sessions,
      |       both_sessions * n_sessions * 1000000 // (ca.c * cb.c)
      |         AS lift_ppm
      |FROM pairs
      |JOIN ct ca ON pairs.type_a = ca.t
      |JOIN ct cb ON pairs.type_b = cb.t
      |CROSS JOIN n""".stripMargin

  /** Time-bound funnel (q119): view → click → purchase where each
    * step must land within 24 HOURS of the previous step's completion
    * — the sequence-matching census q69's unbounded funnel cannot
    * express (q69 asks "did they ever", this asks "did the journey
    * happen as a journey"). Steps bind to the FIRST qualifying event:
    * first view per user, first click in (v, v+24h], first purchase
    * in (c, c+24h] (the testdata's arrival cadence — see q109 —
    * makes 24h the window with signal at every SF). Single census
    * row: users entering each stage and the end-to-end conversion in
    * ppm of viewers.
    *
    * Scale shape: three user-keyed aggregates, each stage joining the
    * (shrinking) previous stage's one-row-per-user frame back onto a
    * type-pruned scan — every join is on user_id (AQE broadcasts the
    * later, smaller stages), all time arithmetic in integer µs (the
    * q17 discipline; an exact boundary must not float-round).
    */
  def q119TimedFunnel(s: SparkSession, dir: String): DataFrame = {
    val StepUs = 24L * 3600L * 1000000L
    val ev = Tables.events(s, dir).select(col("user_id"),
      col("event_type"),
      unix_micros(col("ts").cast("timestamp_ltz")).as("us"))
    val v = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("us")).as("v_us"))
    val c = ev.filter(col("event_type") === "click")
      .join(v, "user_id")
      .filter(col("us") > col("v_us") && col("us") <= col("v_us") + StepUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("c_us"))
    val p = ev.filter(col("event_type") === "purchase")
      .join(c, "user_id")
      .filter(col("us") > col("c_us") && col("us") <= col("c_us") + StepUs)
      .groupBy(col("user_id")).agg(min(col("us")).as("p_us"))
    v.agg(count(lit(1)).as("viewers"))
      .crossJoin(c.agg(count(lit(1)).as("clicked_24h")))
      .crossJoin(p.agg(count(lit(1)).as("purchased_24h")))
      .withColumn("conversion_ppm",
        expr("purchased_24h * 1000000 div viewers"))
  }
  val q119Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP)) AS us
      |  FROM events),
      |v AS (SELECT user_id, min(us) AS v_us FROM ev
      |      WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT ev.user_id, min(us) AS c_us
      |      FROM ev JOIN v ON ev.user_id = v.user_id
      |      WHERE event_type = 'click'
      |        AND us > v_us AND us <= v_us + 86400000000
      |      GROUP BY 1),
      |p AS (SELECT ev.user_id, min(us) AS p_us
      |      FROM ev JOIN c ON ev.user_id = c.user_id
      |      WHERE event_type = 'purchase'
      |        AND us > c_us AND us <= c_us + 86400000000
      |      GROUP BY 1)
      |SELECT (SELECT count(*) FROM v) AS viewers,
      |       (SELECT count(*) FROM c) AS clicked_24h,
      |       (SELECT count(*) FROM p) AS purchased_24h,
      |       (SELECT count(*) FROM p) * 1000000
      |         // (SELECT count(*) FROM v) AS conversion_ppm""".stripMargin

  /** Last-touch attribution census (q117): every purchase is credited
    * to the SAME user's most recent strictly-preceding non-purchase
    * event — the classic conversion-attribution rule (what was the
    * last thing they did before buying?). Purchases with no prior
    * touch credit 'none'. Census per attributed type: conversions,
    * attributed revenue (summed in exact integer CENTS — the q111
    * discipline — so no summation-order ulp can flip a rounded
    * boundary; one float division at the very end), distinct
    * converting users.
    *
    * One running window does the attribution: last(non-purchase type,
    * ignoreNulls) over (user_id; ts, event_id) rows to 1 PRECEDING —
    * the same user-time sort q17/q109 ride (one reusable exchange in
    * a multi-query plan), no self-join of events against events (the
    * naive correlated-subquery spelling is quadratic per user).
    * event_id tie-break: equal-µs purchase/touch pairs attribute
    * identically in both engines.
    */
  def q117Attribution(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.events(s, dir)
      .withColumn("attr",
        last(when(col("event_type") =!= "purchase", col("event_type")), true)
          .over(byUser))
      .filter(col("event_type") === "purchase")
      .groupBy(coalesce(col("attr"), lit("none")).as("attributed_type"))
      .agg(count(lit(1)).as("conversions"),
        round(sum(round(col("value") * 100, 0).cast("long")) / 100.0, 2)
          .as("attributed_value"),
        countDistinct(col("user_id")).as("converting_users"))
  }
  val q117Sql: String =
    """WITH attr AS (
      |  SELECT user_id, event_type, value,
      |         last_value(CASE WHEN event_type <> 'purchase'
      |                         THEN event_type END IGNORE NULLS)
      |           OVER (PARTITION BY user_id ORDER BY ts, event_id
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |           AS attr
      |  FROM events)
      |SELECT coalesce(attr, 'none') AS attributed_type,
      |       count(*) AS conversions,
      |       round(sum(CAST(round(value * 100) AS BIGINT)) / 100.0, 2)
      |         AS attributed_value,
      |       count(DISTINCT user_id) AS converting_users
      |FROM attr WHERE event_type = 'purchase'
      |GROUP BY 1""".stripMargin

  val q109Sql: String =
    """WITH gaps AS (
      |  SELECT event_type,
      |         epoch_us(CAST(ts AS TIMESTAMP))
      |           - epoch_us(CAST(lag(ts) OVER (PARTITION BY user_id
      |                             ORDER BY ts, event_id)
      |                           AS TIMESTAMP)) AS gap_us
      |  FROM events)
      |SELECT event_type,
      |       CAST(length(bin(gap_us)) - 1 AS INTEGER) AS gap_bucket,
      |       count(*) AS gap_count,
      |       min(gap_us) AS min_gap_us, max(gap_us) AS max_gap_us
      |FROM gaps WHERE gap_us IS NOT NULL
      |GROUP BY 1, 2""".stripMargin

  // -------------------------------------------------- LOCF grid (q122)

  /** Gap-filled hourly state grid (q122): the time-series-alignment
    * operator — every user's event stream is resampled onto a dense
    * hourly grid between their first and last event, and the "current
    * state" (last event type at or before each grid hour) is carried
    * forward across empty hours (LOCF — last observation carried
    * forward). Census per carried state: grid cells holding that
    * state, cells where the state was OBSERVED that hour vs carried
    * from an earlier one, and distinct users. This is how behavioral
    * state joins a feature store: the model asks "what state was user
    * U in at hour H" for EVERY hour, not just event hours.
    *
    * Determinism: hours are integer µs-epoch div 3600e6 (the q17
    * µs-truncation discipline); per-hour observation picks the LAST
    * event by (ts, event_id) — a total order, so both engines carry
    * identical states.
    *
    * Scale shape: the corpus crosses the wire ONCE, compacted — the
    * per-(user, hour) last-event pick is a hash-aggregate
    * (max_by over the (ts, event_id) total order) with map-side
    * combine, so shuffle rows are user-hours, not events. Everything
    * downstream runs at GRID scale: bounds come from the compacted
    * obs table (not a second corpus scan), the grid explode is a
    * bounded per-user `sequence` (≤ span-hours cells — the classic
    * resample bound), the obs side of the grid join reuses its
    * aggregation partitioning, and the carry-forward window shuffles
    * only grid rows on user_id. Census output is O(event types).
    */
  def q122LocfGrid(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      // NTZ→LTZ cast before unix_micros, per the q17 discipline
      // (session TZ pinned UTC, so the instant is unchanged)
      .withColumn("h",
        expr("unix_micros(cast(ts as timestamp_ltz)) div 3600000000"))
    // last event of each (user, hour) by the (ts, event_id) total
    // order — max_by on a struct, NOT a row_number window: the
    // aggregate partial-combines map-side, the window would sort the
    // whole corpus inside each (user, hour) partition first.
    // NULL event_type gets the q101 sentinel: a bare NULL observation
    // would read as "no observation" and carry the PREVIOUS state
    // over a real event
    val obs = ev.groupBy(col("user_id"), col("h"))
      .agg(expr("max_by(coalesce(event_type, '<null>'), " +
        "struct(ts, event_id))").as("obs_type"))
    val grid = obs.groupBy(col("user_id"))
      .agg(min(col("h")).as("h0"), max(col("h")).as("h1"))
      .select(col("user_id"),
        explode(sequence(col("h0"), col("h1"))).as("h"))
    val carried = grid.join(obs, Seq("user_id", "h"), "left")
      .withColumn("state", last(col("obs_type"), ignoreNulls = true)
        .over(Window.partitionBy(col("user_id")).orderBy(col("h"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    carried.groupBy(col("state"))
      .agg(count(lit(1)).as("grid_cells"),
        count(col("obs_type")).as("observed_cells"),
        countDistinct(col("user_id")).as("users"))
      .withColumn("carried_cells", expr("grid_cells - observed_cells"))
  }
  val q122Sql: String =
    """WITH ev AS (
      |  SELECT user_id, event_id, event_type,
      |         CAST(ts AS TIMESTAMP) AS ts,
      |         epoch_us(CAST(ts AS TIMESTAMP)) // 3600000000 AS h
      |  FROM events),
      |obs AS (
      |  SELECT user_id, h, coalesce(event_type, '<null>') AS obs_type
      |  FROM (SELECT user_id, h, event_type,
      |               row_number() OVER (PARTITION BY user_id, h
      |                 ORDER BY ts DESC, event_id DESC) AS rn
      |        FROM ev)
      |  WHERE rn = 1),
      |grid AS (
      |  SELECT user_id, unnest(generate_series(min(h), max(h))) AS h
      |  FROM ev GROUP BY user_id),
      |carried AS (
      |  SELECT g.user_id, g.h, o.obs_type,
      |         last_value(o.obs_type IGNORE NULLS)
      |           OVER (PARTITION BY g.user_id ORDER BY g.h
      |                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |           AS state
      |  FROM grid g LEFT JOIN obs o
      |    ON g.user_id = o.user_id AND g.h = o.h)
      |SELECT state, count(*) AS grid_cells,
      |       count(obs_type) AS observed_cells,
      |       count(DISTINCT user_id) AS users,
      |       count(*) - count(obs_type) AS carried_cells
      |FROM carried GROUP BY 1""".stripMargin

  // ---------------------------------- generalization ladder (q132)

  /** Quasi-identifier generalization ladder (q132): the remediation
    * step q101's k-anonymity census motivates — measure how anonymity
    * improves as the behavioral quasi-identifier coarsens. Three
    * grains of the SAME signature: exact per-type counts (q101's QI),
    * counts bucketed to log2 (the usual generalization step), and the
    * bare type SET (counts dropped entirely). Census per (grain,
    * log2-k bucket): signatures and user mass — the k=1 mass shrinking
    * as the grain coarsens is the privacy/utility trade, quantified.
    * A release policy reads this table and picks the coarsest grain
    * whose k=1 bucket is acceptable.
    *
    * Scale shape: q101's exactly, three times over one shared
    * per-(user, type) compaction — map-side combine absorbs the event
    * stream, signatures aggregate per user (collect_list bounded by
    * event-TYPE cardinality), anonymity falls out of grouping, never
    * pairing. Output is O(grains × log2 buckets).
    */
  def q132GeneralizationLadder(s: SparkSession, dir: String): DataFrame = {
    val pc = Tables.events(s, dir)
      .groupBy(col("user_id"),
        coalesce(col("event_type"), lit("<null>")).as("et"))
      .agg(count(lit(1)).as("c"))
    def census(grain: String, term: org.apache.spark.sql.Column): DataFrame =
      pc.groupBy(col("user_id"))
        .agg(md5(concat_ws("|", sort_array(collect_list(md5(term
          .cast("binary"))))).cast("binary")).as("sig"))
        .groupBy(col("sig")).agg(count(lit(1)).as("k"))
        .groupBy(expr("length(bin(k)) - 1").cast("int").as("k_bucket"))
        .agg(count(lit(1)).as("signatures"),
          sum(col("k")).cast("long").as("users"))
        .select(lit(grain).as("grain"), col("k_bucket"),
          col("signatures"), col("users"))
    census("exact_counts", concat_ws(":", col("et"), col("c")))
      .unionAll(census("log2_counts",
        concat_ws(":", col("et"), expr("length(bin(c)) - 1"))))
      .unionAll(census("type_set", col("et")))
  }
  val q132Sql: String = {
    def census(grain: String, term: String): String =
      s"""SELECT '$grain' AS grain,
         |       CAST(length(bin(k)) - 1 AS INTEGER) AS k_bucket,
         |       count(*) AS signatures, CAST(sum(k) AS BIGINT) AS users
         |FROM (SELECT sig, count(*) AS k
         |      FROM (SELECT user_id,
         |                   md5(string_agg(md5($term), '|'
         |                         ORDER BY md5($term))) AS sig
         |            FROM pc GROUP BY 1)
         |      GROUP BY 1)
         |GROUP BY 2""".stripMargin
    s"""WITH pc AS (
       |  SELECT user_id, coalesce(event_type, '<null>') AS et, count(*) AS c
       |  FROM events GROUP BY 1, 2)
       |${census("exact_counts", "et || ':' || c")}
       |UNION ALL
       |${census("log2_counts", "et || ':' || CAST(length(bin(c)) - 1 AS VARCHAR)")}
       |UNION ALL
       |${census("type_set", "et")}""".stripMargin
  }

  // ------------------------------------------------ chi-square (q145)

  /** Daily event-mix drift, chi-square edition (q145): for every day,
    * how far the day's event-type contingency row sits from the
    * corpus-wide mix — the per-cell χ² contribution (O−E)²/E computed
    * as the EXACT integer (O·T − r·c)² ÷ (r·c·T) in permille, plus
    * the day's most-deviating type. q89's KL drift watches sources;
    * this watches TIME, and χ²'s per-cell decomposition names the
    * type that moved (a deploy that doubled error events shows up as
    * that day's top_dev_type, not just a bigger divergence number).
    * No logarithms anywhere: the identity (O·T−rc)²/(rcT) = (O−E)²/E
    * makes the whole statistic a ratio of integers, so the oracle is
    * bit-exact (stricter than the q64/q89 ln convention).
    *
    * Scale shape: one hash-agg to the O(days × types) contingency
    * table; both marginals and T re-aggregate THAT table (never the
    * corpus) and broadcast back; the deviation arithmetic runs at
    * cell grain in DECIMAL(38) (dev² reaches ~10²⁵ at sf0.1 — far
    * past a long), and the per-day rollup + top-deviator window sort
    * only cell-grain rows.
    */
  /** (day, event_type, o) contingency cells of an events frame —
    * integer day index, not a DATE column (date values cross the
    * engine/pandas boundary with unstable dtypes; the Layout.q72
    * epoch-days convention). Frame-parameterized and SUM-mergeable,
    * so the incremental monitor (Streams.incrementalDayTypeCells)
    * lands per-batch partials through the same definition. */
  private[graft] def dayTypeCells(events: DataFrame): DataFrame =
    events
      .groupBy(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"), col("event_type"))
      .agg(count(lit(1)).as("o"))

  def q145Chi2DailyMix(s: SparkSession, dir: String): DataFrame =
    chi2CensusFrom(dayTypeCells(Tables.events(s, dir)))

  /** The χ² census over an already-aggregated (day, event_type, o)
    * cell frame — ONE arithmetic path for batch q145 and the
    * incremental snapshot (q148). */
  private[graft] def chi2CensusFrom(cells: DataFrame): DataFrame = {
    val rt = cells.groupBy(col("day")).agg(sum(col("o")).as("rt"))
    val ct = cells.groupBy(col("event_type")).agg(sum(col("o")).as("ctot"))
    val tot = cells.agg(sum(col("o")).as("t"))
    val dev = cells
      .join(broadcast(rt), Seq("day"))
      .join(broadcast(ct), Seq("event_type"))
      .crossJoin(broadcast(tot))
      // d itself is computed in DECIMAL(38): the o·t and rt·ctot
      // products pass 2⁶³ near ~3·10⁹ events, BEFORE the squared
      // term — a long d would wrap silently (Spark) where DuckDB
      // raises, corrupting every cell ahead of the widened cast
      .withColumn("d",
        expr("CAST(o AS DECIMAL(38,0)) * t - CAST(rt AS DECIMAL(38,0)) * ctot"))
      // divisor widened too: rt·ctot·t passes 2⁶³ near 10⁹ events —
      // a silently-wrapped long divisor would corrupt every cell.
      // The ×1000 numerator itself leaves DECIMAL(38) around
      // T ≈ 5·10⁸ per marginal product; past that bound Spark (ANSI
      // off) yields NULL and sum() would silently SKIP the cell where
      // DuckDB's HUGEINT raises — so the guard below turns the
      // d-was-finite-but-product-overflowed case into the same loud
      // error (round-8 advice). The rescale escape hatch past the
      // bound: publish permille as ×1 and rescale, same identity.
      .withColumn("chi2_cell_milli", expr(
        """CASE
          |  WHEN d IS NOT NULL
          |       AND d * d * 1000
          |           div (CAST(rt AS DECIMAL(38,0)) * ctot * t) IS NULL
          |  THEN CAST(raise_error(
          |    'q145: d*d*1000 (or the divisor rt*ctot*t) overflowed '
          |    || 'DECIMAL(38) — corpus past the T~5e8 permille bound; '
          |    || 'publish permille as x1 and rescale')
          |    AS BIGINT)
          |  ELSE CAST(d * d * 1000
          |    div (CAST(rt AS DECIMAL(38,0)) * ctot * t) AS BIGINT)
          |END""".stripMargin))
    val topw = Window.partitionBy(col("day"))
      .orderBy(abs(col("d")).desc, col("event_type"))
    dev
      .withColumn("rn", row_number().over(topw))
      .groupBy(col("day"))
      .agg(max(col("rt")).as("events"),
        count(lit(1)).as("types"),
        sum(col("chi2_cell_milli")).cast("long").as("chi2_milli"),
        max(when(col("rn") === 1, col("event_type"))).as("top_dev_type"))
  }
  val q145Sql: String =
    """WITH cells AS (
      |  SELECT CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
      |         event_type, count(*) AS o
      |  FROM events GROUP BY 1, 2),
      |rt AS (SELECT day, CAST(sum(o) AS BIGINT) AS rt FROM cells GROUP BY 1),
      |ct AS (SELECT event_type, CAST(sum(o) AS BIGINT) AS ctot
      |       FROM cells GROUP BY 1),
      |tot AS (SELECT CAST(sum(o) AS BIGINT) AS t FROM cells),
      |dev AS (
      |  SELECT day, event_type, rt,
      |         CAST(o AS HUGEINT) * t - CAST(rt AS HUGEINT) * ctot AS d,
      |         CAST((CAST(o AS HUGEINT) * t - CAST(rt AS HUGEINT) * ctot)
      |                * (CAST(o AS HUGEINT) * t - CAST(rt AS HUGEINT) * ctot)
      |                * 1000
      |              // (CAST(rt AS HUGEINT) * ctot * t) AS BIGINT)
      |           AS chi2_cell_milli
      |  FROM cells JOIN rt USING (day) JOIN ct USING (event_type), tot),
      |rn AS (
      |  SELECT day, event_type, rt, chi2_cell_milli,
      |         row_number() OVER (PARTITION BY day
      |           ORDER BY abs(d) DESC, event_type) AS rn
      |  FROM dev)
      |SELECT day, max(rt) AS events, count(*) AS types,
      |       CAST(sum(chi2_cell_milli) AS BIGINT) AS chi2_milli,
      |       max(CASE WHEN rn = 1 THEN event_type END) AS top_dev_type
      |FROM rn GROUP BY 1""".stripMargin

  // ------------------------------------------------ l-diversity (q146)

  /** k-anonymity × l-diversity grid (q146): q101/q132 measured
    * GROUP SIZE (k); this adds the second axis the privacy literature
    * demands — within each quasi-identifier group (the q132
    * log2-count signature), how many DISTINCT values does a sensitive
    * attribute take (here: the user's dominant event type)? A group
    * can be safely large (k high) yet sensitive-homogeneous (l = 1):
    * every member provably shares the attribute, and k-anonymity
    * protects nothing — the homogeneity-attack cell this census
    * makes visible. Output per (k_bucket, l): groups and users.
    *
    * Scale shape: everything is grouping, never pairing (the q101
    * law): one (user, type) compaction feeds both the signature agg
    * and the dominant-type window; the grid is two more hash-aggs at
    * O(users) then O(signatures) grain. Deterministic dominance:
    * (count desc, type desc) — both engines walk the same argmax.
    */
  def q146LDiversity(s: SparkSession, dir: String): DataFrame = {
    val pc = Tables.events(s, dir)
      .groupBy(col("user_id"),
        coalesce(col("event_type"), lit("<null>")).as("et"))
      .agg(count(lit(1)).as("c"))
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("et").desc)
    val dom = pc.withColumn("rn", row_number().over(byUser))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("et").as("dominant"))
    val sig = pc.groupBy(col("user_id"))
      .agg(md5(concat_ws("|", sort_array(collect_list(md5(
        concat_ws(":", col("et"), expr("length(bin(c)) - 1"))
          .cast("binary"))))).cast("binary")).as("sig"))
    sig.join(dom, Seq("user_id"))
      .groupBy(col("sig"))
      .agg(count(lit(1)).as("k"), countDistinct(col("dominant")).as("l"))
      .groupBy(expr("length(bin(k)) - 1").cast("int").as("k_bucket"), col("l"))
      .agg(count(lit(1)).as("groups"), sum(col("k")).cast("long").as("users"))
  }
  val q146Sql: String =
    """WITH pc AS (
      |  SELECT user_id, coalesce(event_type, '<null>') AS et, count(*) AS c
      |  FROM events GROUP BY 1, 2),
      |dom AS (
      |  SELECT user_id, et AS dominant
      |  FROM (SELECT user_id, et,
      |          row_number() OVER (PARTITION BY user_id
      |            ORDER BY c DESC, et DESC) AS rn
      |        FROM pc)
      |  WHERE rn = 1),
      |sig AS (
      |  SELECT user_id,
      |         md5(string_agg(
      |           md5(et || ':' || CAST(length(bin(c)) - 1 AS VARCHAR)), '|'
      |           ORDER BY md5(et || ':' || CAST(length(bin(c)) - 1 AS VARCHAR))))
      |           AS sig
      |  FROM pc GROUP BY 1),
      |grp AS (
      |  SELECT sig.sig, count(*) AS k, count(DISTINCT dominant) AS l
      |  FROM sig JOIN dom USING (user_id)
      |  GROUP BY 1)
      |SELECT CAST(length(bin(k)) - 1 AS INTEGER) AS k_bucket, l,
      |       count(*) AS groups, CAST(sum(k) AS BIGINT) AS users
      |FROM grp GROUP BY 1, 2""".stripMargin

  // ------------------------------------------------ transitions (q139)

  /** Session Markov transition matrix (q139): within the q17/q120
    * session cut, how often does each event type hand off to each
    * next type — counts plus the conditional probability
    * P(to | from) in integer ppm. The first-order behavioral model
    * product analytics fits before anything sequence-learned: the
    * matrix IS the Markov chain, and rows far from the q120 lift
    * table's independence baseline are the journeys worth naming.
    * q83's matrix counts every consecutive pair in a user's HISTORY —
    * including the overnight hand-off from yesterday's last event to
    * today's first, which is not behavior, just adjacency; q139
    * resets the chain at the 30-min gap (the q17 cut), so the two
    * matrices differ by exactly the cross-session fabrications, and
    * the stateful streaming twin (q147 / StatefulTransitions) carries
    * the same cut across micro-batch boundaries.
    *
    * Scale shape: ONE user_id shuffle drives both windows (session
    * flags and lead() share the same sort — one Exchange, one Sort in
    * the plan), then a hash-agg to O(T²) cells; the per-from totals
    * re-aggregate the T²-row matrix (never the corpus) and broadcast
    * back. Tie order at equal-µs timestamps is pinned by the
    * event_id tie-break (the q109 attribution rule: gap VALUES are
    * tie-invariant, but which type follows which is not).
    */
  def q139SessionTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val chained = Tables.events(s, dir)
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts").cast("timestamp_ltz")) -
            unix_micros(col("prev_ts").cast("timestamp_ltz")) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("session_id", sum(col("new_session")).over(
        byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .withColumn("to_session", lead(col("session_id"), 1).over(byUser))
      .filter(col("to_type").isNotNull &&
        col("to_session") === col("session_id"))
    val matrix = chained
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("transitions"))
    val fromTotals = matrix.groupBy(col("from_type"))
      .agg(sum(col("transitions")).as("from_total"))
    matrix.join(broadcast(fromTotals), Seq("from_type"))
      .select(col("from_type"), col("to_type"), col("transitions"),
        expr("transitions * 1000000 div from_total").as("prob_ppm"))
  }
  /** q139's matrix over an arbitrary events relation — parameterized
    * so the q227 RTBF oracle can pass the live-users subquery. */
  def q139SqlFrom(from: String): String =
    s"""WITH flagged AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         CASE WHEN lag(ts) OVER w IS NULL
      |                OR epoch_us(CAST(ts AS TIMESTAMP))
      |                   - epoch_us(CAST(lag(ts) OVER w AS TIMESTAMP))
      |                   > 1800000000
      |              THEN 1 ELSE 0 END AS new_session
      |  FROM $from WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessioned AS (
      |  SELECT user_id, ts, event_id, event_type,
      |         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_id
      |  FROM flagged),
      |chained AS (
      |  SELECT event_type AS from_type,
      |         lead(event_type) OVER w AS to_type,
      |         session_id,
      |         lead(session_id) OVER w AS to_session
      |  FROM sessioned WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |matrix AS (
      |  SELECT from_type, to_type, count(*) AS transitions
      |  FROM chained
      |  WHERE to_type IS NOT NULL AND to_session = session_id
      |  GROUP BY 1, 2),
      |ft AS (SELECT from_type, CAST(sum(transitions) AS BIGINT) AS from_total
      |       FROM matrix GROUP BY 1)
      |SELECT from_type, to_type, transitions,
      |       transitions * 1000000 // from_total AS prob_ppm
      |FROM matrix JOIN ft USING (from_type)""".stripMargin

  val q139Sql: String = q139SqlFrom("events")

  // -------------------------------------------------- deletion (q193)

  /** Deletion propagation (q193) — the right-to-be-forgotten pass the
    * privacy family (q76 PII, q101 re-id, q132 ladder, q146
    * l-diversity) was still missing: given a tombstone set of subjects
    * requesting erasure (planted rule: customers with negative account
    * balance), PURGE every row that belongs to them across the lake —
    * customer rows, their orders, the lineitems of those orders (the
    * transitive FK hop), and their events — then AUDIT the kept side:
    * re-scan each purged relation against the tombstones and count
    * residual references, the number a compliance report must print
    * as zero. Purge is `left_anti`, audit is `left_semi` over the
    * PURGED frame — the audit is a genuine second pass, not algebraic
    * zero, so a broken purge join surfaces as residual_refs > 0.
    *
    * Scale shape: the tombstone key set is the small side everywhere —
    * broadcast anti/semi joins for customer/orders/events; the
    * transitive lineitem hop keys on o_orderkey, the lake's natural
    * bucketing column (ScaleSpec's zero-exchange contract), so the one
    * fact-fact join co-partitions. Census output is O(relations). */
  def q193DeletionPropagation(s: SparkSession, dir: String): DataFrame = {
    val tomb = Tables.customer(s, dir).filter(col("c_acctbal") < 0)
      .select(col("c_custkey"))
    def census(rel: String, df: DataFrame, key: org.apache.spark.sql.Column,
               tombKeys: DataFrame, tombCol: String): DataFrame = {
      val kept = df.join(broadcast(tombKeys), key === col(tombCol), "left_anti")
      val residual = kept.join(broadcast(tombKeys), key === col(tombCol),
        "left_semi")
      df.agg(count(lit(1)).as("total_rows"))
        .crossJoin(kept.agg(count(lit(1)).as("kept_rows")))
        .crossJoin(residual.agg(count(lit(1)).as("residual_refs")))
        .select(lit(rel).as("rel"), col("total_rows"),
          (col("total_rows") - col("kept_rows")).as("purged_rows"),
          col("kept_rows"), col("residual_refs"))
    }
    val orders = Tables.orders(s, dir)
    val purgedOrderKeys = orders
      .join(broadcast(tomb), col("o_custkey") === col("c_custkey"),
        "left_semi")
      .select(col("o_orderkey").as("po_orderkey"))
    census("customer", Tables.customer(s, dir), col("c_custkey"),
        tomb.select(col("c_custkey").as("t_key")), "t_key")
      .unionAll(census("orders", orders, col("o_custkey"),
        tomb.select(col("c_custkey").as("t_key")), "t_key"))
      .unionAll(census("lineitem", Tables.lineitem(s, dir),
        col("l_orderkey"), purgedOrderKeys, "po_orderkey"))
      .unionAll(census("events", Tables.events(s, dir), col("user_id"),
        tomb.select(col("c_custkey").as("t_key")), "t_key"))
  }
  val q193Sql: String =
    """WITH tomb AS (SELECT c_custkey FROM customer WHERE c_acctbal < 0),
      |po AS (SELECT o_orderkey FROM orders
      |       WHERE EXISTS (SELECT 1 FROM tomb t
      |                     WHERE t.c_custkey = orders.o_custkey))
      |SELECT 'customer' AS rel,
      |       (SELECT count(*) FROM customer) AS total_rows,
      |       (SELECT count(*) FROM customer
      |        WHERE EXISTS (SELECT 1 FROM tomb t
      |                      WHERE t.c_custkey = customer.c_custkey))
      |         AS purged_rows,
      |       (SELECT count(*) FROM customer
      |        WHERE NOT EXISTS (SELECT 1 FROM tomb t
      |                          WHERE t.c_custkey = customer.c_custkey))
      |         AS kept_rows,
      |       CAST(0 AS BIGINT) AS residual_refs
      |UNION ALL
      |SELECT 'orders',
      |       (SELECT count(*) FROM orders),
      |       (SELECT count(*) FROM orders
      |        WHERE EXISTS (SELECT 1 FROM tomb t
      |                      WHERE t.c_custkey = orders.o_custkey)),
      |       (SELECT count(*) FROM orders
      |        WHERE NOT EXISTS (SELECT 1 FROM tomb t
      |                          WHERE t.c_custkey = orders.o_custkey)),
      |       CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem',
      |       (SELECT count(*) FROM lineitem),
      |       (SELECT count(*) FROM lineitem
      |        WHERE EXISTS (SELECT 1 FROM po
      |                      WHERE po.o_orderkey = lineitem.l_orderkey)),
      |       (SELECT count(*) FROM lineitem
      |        WHERE NOT EXISTS (SELECT 1 FROM po
      |                          WHERE po.o_orderkey = lineitem.l_orderkey)),
      |       CAST(0 AS BIGINT)
      |UNION ALL
      |SELECT 'events',
      |       (SELECT count(*) FROM events),
      |       (SELECT count(*) FROM events
      |        WHERE EXISTS (SELECT 1 FROM tomb t
      |                      WHERE t.c_custkey = events.user_id)),
      |       (SELECT count(*) FROM events
      |        WHERE NOT EXISTS (SELECT 1 FROM tomb t
      |                          WHERE t.c_custkey = events.user_id)),
      |       CAST(0 AS BIGINT)""".stripMargin
}
