package graft

import graft.ops.FoodPipeline
import graft.streaming.Streams
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming throughput micro-bench: pushes synthetic producer pages
  * (the reference's message shape, 100 products per page) through the
  * full parse → flatten → aggregate pipeline in complete mode and
  * reports products/second.
  *
  * Context: the reference's *designed* ingest rate is ~25 rows/s
  * (100-row page per 4 s of sleeps, BASELINE.md) — its Spark consumer
  * is never the bottleneck, the producer throttles. This measures what
  * the consumer side actually sustains on one node.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val pages = if (args.nonEmpty) args(0).toInt else 500
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    implicit val sc = spark.sqlContext
    import spark.implicits._

    def page(p: Int): String = graft.sources.PagesSource.pageJson(p, 100)

    val in = MemoryStream[String]
    val counts = FoodPipeline.nutriscoreDistribution(FoodPipeline.parsePage(in.toDF()))
    val q = counts.writeStream.format("memory").queryName("bench_counts")
      .outputMode(OutputMode.Complete()).start()
    // warmup
    in.addData(page(0)); q.processAllAvailable()

    val batchSize = if (args.length > 1) args(1).toInt else 50
    val data = (1 to pages).map(page)
    val t0 = System.nanoTime()
    data.grouped(batchSize).foreach { g => in.addData(g); q.processAllAvailable() }
    val sec = (System.nanoTime() - t0) / 1e9
    q.stop()
    val rows = pages * 100L
    println(f"""{"metric":"stream_products_per_sec","value":${rows / sec}%.0f,"pages":$pages,"seconds":$sec%.2f}""")
    spark.stop()
  }
}
