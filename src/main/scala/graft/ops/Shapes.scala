package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Reusable operator shapes extracted from the reference's seven query
  * pipelines (SURVEY.md §2.3). Each is a pure `DataFrame => DataFrame`
  * (or Column combinator) meant to be composed with `.transform(...)` —
  * the same composition style the reference uses
  * (reference Consumer.scala:63-68), which is already the idiomatic
  * Spark pattern: the full pipeline stays one declarative LogicalPlan
  * so Catalyst can prune columns and push filters into the scan.
  */
object Shapes {

  /** Reference Q1 bucketing (Consumer.scala:191-193): case-normalize a
    * code column against a whitelist, everything else → UNKNOWN.
    * Pure `CaseWhen` + `In` — constant-folded and codegen'd.
    */
  def bucketize(c: Column, valid: Seq[String]): Column =
    when(lower(c).isin(valid.map(_.toLowerCase): _*), upper(c))
      .otherwise(lit("UNKNOWN"))

  /** Reference Q2/Q3/Q4 shared shape (Consumer.scala:207,243,255):
    * head of an array column, with the `^[a-z]{2,3}:` language prefix
    * stripped. `get()` (not `getItem`) keeps the reference's Spark 3.5
    * null-on-empty-array semantics under Spark 4's default ANSI mode.
    */
  val langPrefix = "^[a-z]{2,3}:"
  def firstTagStripped(arr: Column): Column =
    regexp_replace(get(arr, lit(0)), langPrefix, "")

  /** Reference Q2 blacklist (Consumer.scala:209-212) applied *after*
    * the strip — we keep the intent (drop placeholder categories), not
    * the reference's unreachable pre-strip entries (SURVEY.md §2.3 Q2).
    */
  def notPlaceholder(c: Column): Column =
    c.isNotNull && !c.isin("undefined", "null", "")

  /** group-count: the reference's universal aggregation
    * (Consumer.scala:196,213,248,260,278). Partial (map-side) + final
    * HashAggregate — one shuffle on the group keys, which is the
    * minimal shuffle for this op at any scale.
    */
  def groupCount(df: DataFrame, keys: Seq[String], cntName: String): DataFrame =
    df.groupBy(keys.map(col): _*).agg(count(lit(1)).as(cntName))

  /** Reference Q6 top-K (Consumer.scala:157-158): orderBy+limit.
    * Catalyst plans this as TakeOrderedAndProject — per-partition
    * top-K then a single-partition merge of K·numPartitions rows; no
    * global sort, so it scales to any input size. Tie-breaks must be
    * total for oracle determinism — callers pass a full ordering.
    */
  def topK(df: DataFrame, k: Int, order: Column*): DataFrame =
    df.orderBy(order: _*).limit(k)

  /** Reference Q7 per-group argmax (Consumer.scala:109-117):
    * row_number over (partitionBy group, orderBy measure desc) == 1.
    * One shuffle on the group key; WindowExec processes each group
    * streamingly. For a pure argmax, max_by is cheaper (plain hash
    * aggregate, no sort) — both are provided; argmaxPerGroup keeps the
    * reference's window shape, maxByPerGroup is the scale-preferred
    * variant.
    */
  def argmaxPerGroup(df: DataFrame, groupCol: String, order: Seq[Column],
                     rankCol: String = "rn"): DataFrame =
    df.withColumn(rankCol,
        row_number().over(Window.partitionBy(col(groupCol)).orderBy(order: _*)))
      .filter(col(rankCol) === 1)
      .drop(rankCol)

  /** Skew-resistant group-count: two-stage aggregation through a
    * random salt. Stage 1 shuffles on (key, salt) — a hot key spreads
    * over `saltBuckets` reducers instead of melting one — stage 2
    * merges the per-salt partials (tiny: saltBuckets rows per hot
    * key). Use when a group key is known-skewed (power-law brands,
    * null-heavy join keys) and AQE's skew handling can't help (it
    * splits joins, not aggregations). For plain counts Spark's partial
    * aggregation already absorbs most skew map-side; salting matters
    * for aggregates with large per-key state (collect_list,
    * count_distinct re-aggregation, percentile buffers).
    */
  def saltedGroupCount(df: DataFrame, key: String, cntName: String,
                       saltBuckets: Int = 16): DataFrame =
    df.withColumn("__salt", (rand(seed = 42) * saltBuckets).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(count(lit(1)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).cast("long").as(cntName))

  /** Dashboard shape (reference streamlit/app.py:153-160): top-N rows
    * by a count plus an "OTHER" bucket aggregating the remainder.
    *
    * Scale shape: the top slice is [[topK]] — planned as
    * TakeOrderedAndProject (per-partition top-N, single-partition merge
    * of N·numPartitions rows only) — and the OTHER row is total-minus-
    * top: one global aggregate of `counts` (partial map-side, a few
    * bytes per partition cross the wire) minus the sum of the already-
    * tiny top slice. NO window anywhere, so a high-cardinality counts
    * table (brands/categories at 100 TB: 10⁶-10⁸ keys) never funnels
    * through a single-partition WindowExec. The `counts` input is
    * referenced by two branches (top slice and global total), so its
    * subtree is planned twice; AQE's exchange reuse collapses the two
    * identical aggregate exchanges at runtime when it can, and either
    * way the duplicated work is the CHEAP post-aggregation frame, not
    * the raw table.
    *
    * Correctness at the boundary: topK's (cnt desc, key asc) total
    * ordering picks the identical top-N set the ranked-window version
    * picked. Null counts are dropped up front (the old version's
    * null-sum filter made an all-null remainder emit no OTHER row —
    * preserved here by counting only non-null rows in `__n`), and
    * `__top_total` coalesces to 0 so n=0 yields (OTHER, grand total)
    * exactly as ranking everything below the cut did.
    */
  def topNPlusOther(counts: DataFrame, keyCol: String, cntCol: String,
                    n: Int, otherLabel: String = "OTHER"): DataFrame = {
    val clean = counts.filter(col(cntCol).isNotNull)
    val top = topK(clean, n, col(cntCol).desc, col(keyCol).asc)
      .select(col(keyCol), col(cntCol))
    val totals = clean.agg(
      sum(col(cntCol)).cast("long").as("__total"),
      count(lit(1)).as("__n"))
    val topTotals = top.agg(
      coalesce(sum(col(cntCol)), lit(0L)).cast("long").as("__top_total"))
    val other = totals.crossJoin(topTotals)
      .filter(col("__n") > n)
      .select(lit(otherLabel).as(keyCol),
        (col("__total") - col("__top_total")).cast("long").as(cntCol))
    top.unionByName(other)
  }

  /** One-pass pipeline telemetry: attach named counters to a frame
    * via `Dataset.observe` — the metrics are computed by the SAME job
    * that materializes the frame, as accumulator-style aggregates on
    * the rows flowing past. At 100 TB this is the difference between
    * "how many docs did the quality gate drop" costing zero extra
    * scans and costing one full lake rescan per counter (`count()`
    * per stage). Metrics must be aggregate expressions (count/sum/
    * min/max over the observed frame's columns); read them from the
    * returned Observation AFTER an action on the frame.
    */
  def observed(df: DataFrame, name: String, metrics: Column*)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = org.apache.spark.sql.Observation(name)
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }
}
