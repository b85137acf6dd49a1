package graft.queries

import graft.{SparkEntry, SparkSpec, Tables}

/** The spark.sql(...) surface: a user driving this engine with SQL
  * TEXT gets the same results as the DataFrame API. For the
  * relational family the DuckDB oracle strings are plain ANSI that
  * Spark's parser also accepts — so the literal oracle text runs on
  * BOTH engines, and here it must reproduce the DataFrame form
  * row-for-row. (The curation/ANN queries use DuckDB list/lambda
  * dialect and are exercised through the driver's DuckDB compare
  * instead.)
  */
class SqlSurfaceSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  /** Oracle strings that are dialect-shared (no str_split, list
    * lambdas, epoch, or `//`): the ANSI relational core. */
  val sharedDialect: Seq[String] = Seq(
    "q10_revenue_by_nation",
    "q11_brand_volume",
    "q12_customers_no_orders",
    "q13_active_suppliers",
    "q15_order_rollup",
    "q9_weighted_mean")

  test("spark.sql(oracle text) equals the DataFrame form for the ANSI relational core") {
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem").foreach { t =>
      spark.read.parquet(s"$sf/$t.parquet").createOrReplaceTempView(t)
    }
    sharedDialect.foreach { name =>
      val viaSql = spark.sql(SparkEntry.oracleSql(name))
      val viaDf = SparkEntry.queries(name)(spark, sf)
      assert(rowsOf(viaSql) === rowsOf(viaDf),
        s"$name: SQL text and DataFrame form disagree")
    }
  }
}
