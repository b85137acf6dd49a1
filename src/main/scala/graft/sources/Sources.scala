package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.util.Properties

/** Batch source abstractions (SURVEY.md §2.1): the reference reads
  * Kafka (streaming, see graft.streaming.Streams) and JDBC (S4 — the
  * dashboard's `SELECT * FROM <table>` reads, streamlit/app.py:41-102).
  * File formats are the testbed/lake equivalents.
  *
  * Scale notes: `jdbcPartitioned` is the 1000-executor-safe JDBC scan —
  * the reference's single `SELECT *` would funnel the whole table
  * through one connection; partitioning on a numeric key fans the read
  * out across executors. Parquet/json/csv readers go through Spark's
  * vectorized/file-source paths with pushdown and pruning for free.
  */
object Sources {

  /** S4 parity: whole-table JDBC read (dashboard-style). */
  def jdbcTable(spark: SparkSession, url: String, table: String,
                props: Properties): DataFrame =
    spark.read.jdbc(url, table, props)

  /** Scale path: JDBC read partitioned on a numeric column — one
    * executor-side connection per partition stripe. */
  def jdbcPartitioned(spark: SparkSession, url: String, table: String,
                      partitionCol: String, lower: Long, upper: Long,
                      numPartitions: Int, props: Properties): DataFrame =
    spark.read.jdbc(url, table, partitionCol, lower, upper, numPartitions, props)

  def parquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** JSON-lines with a declared schema — schema-on-read like the
    * reference's from_json, but at the source (no inference pass over
    * 100 TB; schema inference reads the data twice). */
  def jsonLines(spark: SparkSession, path: String,
                schema: org.apache.spark.sql.types.StructType): DataFrame =
    spark.read.schema(schema).json(path)

  def csv(spark: SparkSession, path: String,
          schema: org.apache.spark.sql.types.StructType,
          header: Boolean = true): DataFrame =
    spark.read.schema(schema).option("header", header.toString).csv(path)
}
