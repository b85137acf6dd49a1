package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Bucketing for co-located joins (Layout.bucketedWrite): the
  * write-once-join-free layout contract, proven at the PLAN level —
  * the same equi-join that shuffles both sides on plain tables plans
  * ZERO Exchange when both sides were bucketed on the join key with
  * matching bucket counts, and a keyed aggregation on the bucket
  * column skips its exchange too. Values are asserted identical
  * between the bucketed and plain paths (layout must never change
  * answers).
  */
class BucketedJoinSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** Exchanges in the PRE-execution plan — after execution AQE wraps
    * them in ShuffleQueryStageExec and a naive count sees zero. */
  private def shuffleCount(df: DataFrame): Int = {
    def walk(p: SparkPlan): Seq[SparkPlan] = p.collect { case n => n }.flatMap {
      case a: AdaptiveSparkPlanExec => walk(a.executedPlan)
      case n => Seq(n)
    }
    walk(df.queryExecution.executedPlan)
      .count(_.isInstanceOf[ShuffleExchangeExec])
  }

  test("bucketed co-located join and keyed agg plan ZERO exchange; plain twin shuffles") {
    val ev = graft.Tables.events(spark, sf)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("value"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("value").as("error_value"))
    Layout.bucketedWrite(purchases, "bspec_purchases", "user_id", 8)
    Layout.bucketedWrite(errors, "bspec_errors", "user_id", 8)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // round the float sum: the two layouts accumulate in different
      // partition orders, and an unrounded double compare would be
      // flaky exactly where addition is non-associative
      def census(df: DataFrame) = df.groupBy(col("user_id"))
        .agg(count(lit(1)).as("pairs"),
          round(sum(col("error_value")), 2).as("ev"))
      val bucketed = census(spark.table("bspec_purchases")
        .join(spark.table("bspec_errors"), "user_id"))
      val plain = census(purchases.join(errors, "user_id"))

      assert(shuffleCount(bucketed) === 0,
        "both sides bucketed on the join key: join AND agg must reuse " +
          "the write-time partitioning (zero Exchange)")
      assert(shuffleCount(plain) >= 2,
        "counterfactual broken: the plain twin should shuffle both sides")
      assert(rowsOf(bucketed) === rowsOf(plain),
        "layout changed answers")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS bspec_purchases")
      spark.sql("DROP TABLE IF EXISTS bspec_errors")
    }
  }
}
