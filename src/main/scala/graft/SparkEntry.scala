package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.Parity

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator registers here twice: a Spark query over
  * the testdata tables and (where SQL-expressible) a DuckDB oracle over
  * the same parquet. Column names are aliased identically on both sides
  * — the driver sorts columns by name before hashing.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Parity.q1GradeDist(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_grade_dist" -> (Parity.q1GradeDist _),
    "q2_category_dist" -> (Parity.q2CategoryDist _),
    "q3_brand_dist" -> (Parity.q3BrandDist _),
    "q4_packaging_dist" -> (Parity.q4PackagingDist _),
    "q5_nova_summary" -> (Parity.q5NovaSummary _),
    "q6_top_token_docs" -> (Parity.q6TopTokenDocs _),
    "q7_top_order_per_priority" -> (Parity.q7TopOrderPerPriority _),
    "q8_top_nations_other" -> (Parity.q8TopNationsOther _),
    "q9_weighted_mean" -> (Parity.q9WeightedMean _),
  )

  /** DuckDB-equivalent SQL per query key (same parquet tables). */
  def oracleSql: Map[String, String] = Map(
    "q1_grade_dist" -> Parity.q1Sql,
    "q2_category_dist" -> Parity.q2Sql,
    "q3_brand_dist" -> Parity.q3Sql,
    "q4_packaging_dist" -> Parity.q4Sql,
    "q5_nova_summary" -> Parity.q5Sql,
    "q6_top_token_docs" -> Parity.q6Sql,
    "q7_top_order_per_priority" -> Parity.q7Sql,
    "q8_top_nations_other" -> Parity.q8Sql,
    "q9_weighted_mean" -> Parity.q9Sql,
  )
}
