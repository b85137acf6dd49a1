package graft.queries

import graft.Tables
import graft.functions.ZOrderFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-path half of scan efficiency at
  * 100 TB: how rows are arranged in files decides what min/max file
  * statistics can prune later. Nothing here shuffles more than once;
  * the curve position is computed scan-side in codegen.
  */
object Layout {

  /** File-id granularity for the q72 census: the 32-bit curve space
    * split into ≤1024 equal z-ranges (2^22 positions each) — a stand-in
    * for "one parquet file per range" that keeps the oracle exact. */
  val ZFileShift = 4194304L // 2^22

  private def dayAndCust(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      col("o_custkey"))

  /** Z-order layout census (q72): Morton-interleave (order day,
    * customer) and report, per curve-range "file", the row count and
    * the min/max of BOTH dimensions. The point the numbers make: range-
    * partitioning by the curve keeps both per-file ranges narrow at
    * once (a date-sorted layout would leave customer min/max spanning
    * the whole domain in every file), so filters on either dimension
    * prune files. The write path for a real table is
    * [[zorderWrite]] — this census is its oracle-checkable shadow.
    */
  def q72ZorderCensus(s: SparkSession, dir: String): DataFrame = {
    dayAndCust(s, dir)
      .select(col("day"), col("o_custkey"),
        ZOrderFunctions.zorder2(col("day") % 65536, col("o_custkey") % 65536)
          .as("z"))
      .groupBy(expr(s"z div $ZFileShift").as("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        min(col("o_custkey")).as("min_cust"), max(col("o_custkey")).as("max_cust"))
  }

  val q72Sql: String = {
    val day = "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
    val z = ZOrderFunctions.zorderSql(s"($day % 65536)", "(o_custkey % 65536)")
    s"""SELECT $z // $ZFileShift AS zfile,
       |       count(*) AS n_rows,
       |       min($day) AS min_day, max($day) AS max_day,
       |       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust
       |FROM orders GROUP BY 1""".stripMargin
  }

  /** The actual layout write: range-partition by curve position (one
    * Exchange — the sort Spark would do anyway to write sorted files)
    * and sort within partitions so parquet row groups inherit the
    * locality. `targetFiles` maps to cluster parallelism at scale. */
  def zorderWrite(df: DataFrame, x: String, y: String,
                  targetFiles: Int): DataFrame = {
    val z = df.withColumn("z",
      ZOrderFunctions.zorder2(col(x).cast("long") % 65536,
        col(y).cast("long") % 65536))
    z.repartitionByRange(targetFiles, col("z")).sortWithinPartitions(col("z"))
  }
}
