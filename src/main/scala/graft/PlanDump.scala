package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dev tool: dump explain("formatted") for selected queries (plan
  * review artifact; see PLANS.md). Not part of the driver contract. */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val out = if (args.length > 1) args(1) else "/tmp/plans.txt"
    val spark = LocalSession.build()
    spark.sparkContext.setLogLevel("ERROR")
    val picks = if (args.length > 2) args.drop(2).toSet
      else Set("q1_grade_dist", "q10_revenue_by_nation", "q11_brand_volume",
        "q16_hourly_event_stats", "q26_minhash_buckets", "q29_cosine_topk")
    val sb = new StringBuilder
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      if (picks(name)) {
        sb.append(s"==== $name ====\n")
        sb.append(fn(spark, sfDir).queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
        sb.append("\n")
      }
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
