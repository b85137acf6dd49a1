package graft.sources

import graft.SparkSpec
import graft.ops.FoodPipeline
import org.apache.spark.sql.functions._

class PagesSourceSpec extends SparkSpec {

  test("DSv2 source: row count, schema, and short-name registration") {
    val df = spark.read.format("graft-pages")
      .option("pages", 10).option("productsPerPage", 5).load()
    assert(df.schema === PagesSource.schema)
    assert(df.count() === 10)
  }

  test("pages split across the configured number of input partitions") {
    val df = spark.read.format("graft-pages")
      .option("pages", 12).option("numPartitions", 3).load()
    assert(df.rdd.getNumPartitions === 3)
    assert(df.count() === 12)
  }

  test("composes with FoodPipeline.parsePage end-to-end (the Kafka-shape contract)") {
    val pages = spark.read.format("graft-pages")
      .option("pages", 4).option("productsPerPage", 25).load()
    val products = FoodPipeline.parsePage(pages)
    assert(products.count() === 100)
    val dist = FoodPipeline.nutriscoreDistribution(products)
    // grades cycle a,b,c,d,e,zz,null over 100 products: null dropped,
    // zz → UNKNOWN, so buckets must be exactly {A,B,C,D,E,UNKNOWN}
    val buckets = dist.collect().map(_.getString(0)).toSet
    assert(buckets === Set("A", "B", "C", "D", "E", "UNKNOWN"))
    assert(dist.agg(sum("product_count")).collect()(0).getLong(0) < 100) // nulls dropped
  }

  test("deterministic: two reads produce identical bytes") {
    def read() = spark.read.format("graft-pages")
      .option("pages", 3).option("productsPerPage", 7).load()
    assert(rowsOf(read()) === rowsOf(read()))
  }
}
