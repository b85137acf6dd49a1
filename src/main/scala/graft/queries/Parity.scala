package graft.queries

import graft.Tables
import graft.ops.Shapes
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's seven query pipelines (SURVEY.md §2.3) plus its two
  * dashboard aggregations (§2.6), re-expressed over the driver testdata
  * tables. Each keeps the exact operator shape of the reference query it
  * mirrors (cited per query) so the full §2 inventory is exercised and
  * oracle-checked; the OpenFoodFacts-schema versions of the same
  * pipelines live in [[graft.ops.FoodPipeline]] and are unit-tested on
  * nested fixtures.
  *
  * Scale notes (100 TB): every query here is scan → narrow projections/
  * filters → ONE shuffle (the groupBy or window key) → small result.
  * Filters and column pruning reach the parquet scan (verified via
  * explain in the specs); top-K uses TakeOrderedAndProject, never a
  * global sort.
  */
object Parity {

  /** Q1 analog — nutriscore distribution (reference Consumer.scala:187-199):
    * whitelist-bucketize a grade code, drop nulls, group-count.
    */
  def q1GradeDist(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"))
      .filter(col("l_returnflag").isNotNull)
      .withColumn("grade", Shapes.bucketize(col("l_returnflag"), Seq("a", "n")))
      .transform(df => Shapes.groupCount(df, Seq("grade"), "product_count"))
  }
  val q1Sql: String =
    """SELECT CASE WHEN lower(l_returnflag) IN ('a','n') THEN upper(l_returnflag)
      |            ELSE 'UNKNOWN' END AS grade,
      |       count(*) AS product_count
      |FROM lineitem WHERE l_returnflag IS NOT NULL GROUP BY 1""".stripMargin

  /** Q2 analog — category distribution (reference Consumer.scala:201-215):
    * head of a token array, strip prefix, blacklist-filter, group-count.
    * Token array comes from splitting document text (the testdata has no
    * array columns outside embeddings).
    */
  def q2CategoryDist(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(split(col("text"), " ").as("toks"))
      .withColumn("main_category", Shapes.firstTagStripped(col("toks")))
      .filter(Shapes.notPlaceholder(col("main_category")))
      .transform(df => Shapes.groupCount(df, Seq("main_category"), "category_count"))
  }
  val q2Sql: String =
    """SELECT regexp_replace(str_split(text, ' ')[1], '^[a-z]{2,3}:', '') AS main_category,
      |       count(*) AS category_count
      |FROM documents
      |WHERE regexp_replace(str_split(text, ' ')[1], '^[a-z]{2,3}:', '') IS NOT NULL
      |  AND regexp_replace(str_split(text, ' ')[1], '^[a-z]{2,3}:', '')
      |      NOT IN ('undefined','null','')
      |GROUP BY 1""".stripMargin

  /** Q3 analog — brand distribution (reference Consumer.scala:239-250):
    * strip a fixed prefix, null-filter, group-count.
    */
  def q3BrandDist(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(regexp_replace(col("p_brand"), "^Brand#", "").as("brand"))
      .filter(col("brand").isNotNull)
      .transform(df => Shapes.groupCount(df, Seq("brand"), "product_count"))
  }
  val q3Sql: String =
    """SELECT regexp_replace(p_brand, '^Brand#', '') AS brand, count(*) AS product_count
      |FROM part WHERE regexp_replace(p_brand, '^Brand#', '') IS NOT NULL
      |GROUP BY 1""".stripMargin

  /** Q4 analog — packaging distribution (reference Consumer.scala:252-262):
    * first word of a descriptor, group-count.
    */
  def q4PackagingDist(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(split(col("p_type"), " ").getItem(0).as("packaging"))
      .filter(col("packaging").isNotNull)
      .transform(df => Shapes.groupCount(df, Seq("packaging"), "packaging_count"))
  }
  val q4Sql: String =
    """SELECT str_split(p_type, ' ')[1] AS packaging, count(*) AS packaging_count
      |FROM part WHERE str_split(p_type, ' ')[1] IS NOT NULL GROUP BY 1""".stripMargin

  /** Q5 analog — NOVA group summary (reference Consumer.scala:264-280):
    * regexp_extract a digit, cast int, keep a label column, 2-key
    * group-count.
    */
  def q5NovaSummary(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(col("p_brand"))
      .filter(col("p_brand").isNotNull && length(col("p_brand")) > 0)
      .withColumn("nova_group", regexp_extract(col("p_brand"), "(\\d)", 1).cast("int"))
      .withColumn("nova_label", regexp_replace(col("p_brand"), "^Brand#", ""))
      .transform(df => Shapes.groupCount(df, Seq("nova_group", "nova_label"), "product_count"))
  }
  val q5Sql: String =
    """SELECT CAST(regexp_extract(p_brand, '(\d)', 1) AS INTEGER) AS nova_group,
      |       regexp_replace(p_brand, '^Brand#', '') AS nova_label,
      |       count(*) AS product_count
      |FROM part WHERE p_brand IS NOT NULL AND length(p_brand) > 0
      |GROUP BY 1, 2""".stripMargin

  /** Q6 analog — top-10 by exploded-element count (reference
    * Consumer.scala:71-84,147-165): explode a token array, non-empty
    * filter, group-count + a representative element, top-10.
    * The reference's `first("additive")` is order-dependent
    * (SURVEY.md §7.4) — we pin deterministic semantics with min().
    */
  def q6TopTokenDocs(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("token_count"), min(col("tok")).as("top_token"))
      .transform(df => Shapes.topK(df, 10, col("token_count").desc, col("doc_id").asc))
  }
  val q6Sql: String =
    """SELECT doc_id, count(*) AS token_count, min(tok) AS top_token
      |FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
      |WHERE tok IS NOT NULL AND tok <> ''
      |GROUP BY doc_id ORDER BY token_count DESC, doc_id ASC LIMIT 10""".stripMargin

  /** Q7 analog — per-group argmax via ranked window (reference
    * Consumer.scala:106-124): row_number over (partitionBy category,
    * orderBy measure desc) == 1. Tie-break on key for determinism.
    */
  def q7TopOrderPerPriority(s: SparkSession, dir: String): DataFrame = {
    Tables.orders(s, dir)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .transform(df => Shapes.argmaxPerGroup(df, "o_orderpriority",
        Seq(col("o_totalprice").desc, col("o_orderkey").asc)))
  }
  val q7Sql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |         row_number() OVER (PARTITION BY o_orderpriority
      |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
      |  FROM orders) WHERE rn = 1""".stripMargin

  /** Dashboard analog — top-N + "Autres" other-bucket
    * (reference streamlit/app.py:153-160).
    */
  def q8TopNationsOther(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.customer(s, dir)
      .join(broadcast(Tables.nation(s, dir)),
        col("c_nationkey") === col("n_nationkey"))
      .transform(df => Shapes.groupCount(df, Seq("n_name"), "customer_count"))
    Shapes.topNPlusOther(counts, "n_name", "customer_count", 8)
  }
  val q8Sql: String =
    """WITH counts AS (
      |  SELECT n_name, count(*) AS customer_count
      |  FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY 1),
      |ranked AS (
      |  SELECT n_name, customer_count,
      |         row_number() OVER (ORDER BY customer_count DESC, n_name ASC) AS rk
      |  FROM counts)
      |SELECT n_name, customer_count FROM ranked WHERE rk <= 8
      |UNION ALL
      |SELECT 'OTHER' AS n_name, CAST(sum(customer_count) AS BIGINT) AS customer_count
      |FROM ranked WHERE rk > 8 HAVING sum(customer_count) IS NOT NULL""".stripMargin

  /** q3 re-run through the skew-resistant two-stage salted
    * aggregation: the ORACLE IS q3's plain SQL — proving the salted
    * plan computes exactly what the direct plan computes. (Counts are
    * salt-invariant; the salt only spreads hot keys over reducers.)
    */
  def q42SaltedBrandDist(s: SparkSession, dir: String): DataFrame = {
    Tables.part(s, dir)
      .select(regexp_replace(col("p_brand"), "^Brand#", "").as("brand"))
      .filter(col("brand").isNotNull)
      .transform(df => Shapes.saltedGroupCount(df, "brand", "product_count"))
  }
  val q42Sql: String = q3Sql

  /** Q6 analog with a TRUE mode aggregate — the reference names its
    * column "most_common_additive" but computes scan-order `first()`
    * (reference Consumer.scala:155, SURVEY.md §2.3 Q6); this is the
    * named intent done right: Spark's built-in
    * `mode(deterministic = true)` (lowest value on frequency ties, so
    * reproducible under any partitioning). Same shape on the
    * OpenFoodFacts schema: [[graft.ops.FoodPipeline.topAdditiveProductsTrueMode]].
    * The oracle spells the deterministic mode as a per-group argmax
    * (count desc, token asc) rather than DuckDB's `mode()`, whose
    * tie-break is unspecified.
    */
  def q45TrueModeTokens(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .select(col("doc_id"), explode_outer(split(col("text"), " ")).as("tok"))
      .filter(col("tok").isNotNull && col("tok") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("token_count"),
        mode(col("tok"), deterministic = true).as("most_common_token"))
      .transform(df => Shapes.topK(df, 10, col("token_count").desc, col("doc_id").asc))
  }
  val q45Sql: String =
    """WITH tf AS (
      |  SELECT doc_id, tok, count(*) AS c
      |  FROM (SELECT doc_id, unnest(str_split(text, ' ')) AS tok FROM documents)
      |  WHERE tok IS NOT NULL AND tok <> '' GROUP BY 1, 2),
      |ranked AS (
      |  SELECT doc_id, tok, c,
      |         CAST(sum(c) OVER (PARTITION BY doc_id) AS BIGINT) AS token_count,
      |         row_number() OVER (PARTITION BY doc_id
      |                            ORDER BY c DESC, tok ASC) AS rn
      |  FROM tf)
      |SELECT doc_id, token_count, tok AS most_common_token
      |FROM ranked WHERE rn = 1
      |ORDER BY token_count DESC, doc_id ASC LIMIT 10""".stripMargin

  /** Dashboard analog — weighted mean Σ(x·w)/Σ(w)
    * (reference streamlit/app.py:213-215). Rounded to keep the
    * float-sum oracle comparison stable.
    */
  def q9WeightedMean(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * col("l_quantity")) / sum(col("l_quantity")), 2)
        .as("weighted_avg_price"))
  }
  val q9Sql: String =
    """SELECT l_returnflag,
      |       round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 2)
      |         AS weighted_avg_price
      |FROM lineitem GROUP BY 1""".stripMargin
}
