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

  test("streaming: admission control paces pagesPerTrigger pages per micro-batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages_stream")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-pages")
      .option("pages", 20).option("productsPerPage", 5)
      .option("pagesPerTrigger", 7)
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }.start()
    assert(q.awaitTermination(60000))
    // 20 pages at 7/trigger -> batches of 7, 7, 6 pages
    assert(batchSizes.toSeq.filter(_ > 0).sorted === Seq(6L, 7L, 7L))
  }

  test("streaming: an allAvailable limit (Trigger.Once semantics) drains everything in one batch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages_once")
    val batchSizes = scala.collection.mutable.ArrayBuffer[Long]()
    val q = spark.readStream.format("graft-pages")
      .option("pages", 20).option("productsPerPage", 5)
      .option("pagesPerTrigger", 7)
      .load()
      .writeStream
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batchSizes.synchronized { batchSizes += batch.count() }
        ()
      }.start()
    assert(q.awaitTermination(60000))
    // Trigger.Once passes ReadLimit.allAvailable: the pacing must yield
    // to the engine's limit and the single batch must carry ALL pages
    assert(batchSizes.toSeq === Seq(20L))
  }

  test("admission control honors the maxRows component of a CompositeReadLimit") {
    import org.apache.spark.sql.connector.read.streaming.ReadLimit
    val stream = new PagesMicroBatchStream(pages = 100, productsPerPage = 5,
      numPartitions = 2, pagesPerTrigger = 7)
    def endFrom(limit: ReadLimit): Int =
      stream.latestOffset(PageOffset(0), limit).asInstanceOf[PageOffset].page
    // composite(min, max) — what AvailableNow composes — must be bounded
    // by its maxRows component, not silently fall back to pagesPerTrigger
    assert(endFrom(ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(1, 0L), ReadLimit.maxRows(3)))) === 3)
    // a min-only composite never throttles: everything is admitted
    assert(endFrom(ReadLimit.compositeLimit(
      Array(ReadLimit.minRows(1, 0L)))) === 100)
    // plain limits unchanged
    assert(endFrom(ReadLimit.maxRows(4)) === 4)
    assert(endFrom(ReadLimit.allAvailable()) === 100)
  }

  test("streaming: checkpoint recovery resumes mid-topic without replaying pages") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages_recover")
    val out = s"$dir/out"
    def run(): Unit = {
      val q = spark.readStream.format("graft-pages")
        .option("pages", 12).option("productsPerPage", 3)
        .option("pagesPerTrigger", 5)
        .load()
        .writeStream
        .option("checkpointLocation", s"$dir/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("parquet").option("path", out).start()
      assert(q.awaitTermination(60000))
    }
    run() // consumes all 12 pages across 3 batches
    run() // restart from checkpoint: nothing new to consume
    val rows = spark.read.parquet(out)
    assert(rows.count() === 12, "each page must land exactly once")
    assert(rows.distinct().count() === 12)
  }

  test("streaming pipeline parity: the same parse+aggregate over the streamed topic") {
    val dir = java.nio.file.Files.createTempDirectory("graft_pages_parity")
    val streamed = spark.readStream.format("graft-pages")
      .option("pages", 6).option("productsPerPage", 20)
      .option("pagesPerTrigger", 2).load()
    val agg = FoodPipeline.nutriscoreDistribution(FoodPipeline.parsePage(streamed))
    val q = agg.writeStream.format("memory").queryName("pages_stream_counts")
      .outputMode(org.apache.spark.sql.streaming.OutputMode.Complete())
      .option("checkpointLocation", s"$dir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
    assert(q.awaitTermination(60000))
    val batch = FoodPipeline.nutriscoreDistribution(FoodPipeline.parsePage(
      spark.read.format("graft-pages")
        .option("pages", 6).option("productsPerPage", 20).load()))
    assert(rowsOf(sql("SELECT * FROM pages_stream_counts")) === rowsOf(batch))
  }
}
