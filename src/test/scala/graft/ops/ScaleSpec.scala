package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-technique tests: salted aggregation equivalence and bucketed
  * co-located joins (the shuffle-elimination strategy for repeated
  * fact-fact joins at 100 TB).
  */
class ScaleSpec extends SparkSpec {
  import spark.implicits._

  test("saltedGroupCount equals plain groupCount (skew-spread, same totals)") {
    val df = (Seq.fill(500)("hot") ++ Seq("a", "b", "c")).toDF("k")
    val plain = rowsOf(Shapes.groupCount(df, Seq("k"), "cnt"))
    val salted = rowsOf(Shapes.saltedGroupCount(df, "k", "cnt"))
    assert(salted === plain)
  }

  test("bucketed tables join without a shuffle exchange") {
    // (warehouse dir is a temp dir, set statically in SparkSpec)
    val left = (1L to 1000L).map(i => (i, s"l$i")).toDF("key", "lval")
    val right = (1L to 1000L).map(i => (i, i * 2.0)).toDF("key", "rval")
    left.write.bucketBy(8, "key").sortBy("key")
      .mode("overwrite").saveAsTable("graft_bucketed_left")
    right.write.bucketBy(8, "key").sortBy("key")
      .mode("overwrite").saveAsTable("graft_bucketed_right")
    // force the sort-merge path (broadcast would win on toy sizes and
    // ignore bucketing — at real scale both sides are too big to
    // broadcast, which is exactly when bucketing pays)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("graft_bucketed_left")
        .join(spark.table("graft_bucketed_right"), "key")
      // co-located bucketed join: both sides pre-partitioned on the
      // key, so the sort-merge join needs NO shuffle exchange
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      assert(!plan.contains("Exchange hashpartitioning"), plan)
      assert(plan.contains("Bucketed: true"), plan)
      assert(joined.count() === 1000)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE graft_bucketed_left")
    spark.sql("DROP TABLE graft_bucketed_right")
  }

  test("partitionBy write → partition-pruned read (the 100 TB layout contract)") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .write.partitionBy("event_type").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "purchase")
    val scan = q.queryExecution.executedPlan.toString
    // the predicate lands in PartitionFilters: non-matching directories
    // are never listed, let alone read
    assert(scan.contains("PartitionFilters: [isnotnull(event_type"), scan)
    assert(q.count() > 0)
  }

  test("repartition-then-reuse: one shuffle serves two aggregations") {
    // AQE defers a cached relation's output partitioning until
    // materialization, so the no-exchange property is asserted on the
    // non-adaptive plan (the AQE final plan elides it at runtime too).
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .repartition(col("user_id"))
      .cache()
    try {
      val a = ev.groupBy("user_id").count()
      val b = ev.groupBy("user_id").agg(sum("value"))
      // both consumers read the same cached, pre-partitioned data: the
      // only exchange is the REPARTITION_BY_COL inside the cached
      // relation (materialized once); the aggregates above the
      // InMemoryTableScan add none
      def aboveCache(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.executedPlan.toString.split("InMemoryRelation")(0)
      assert(!aboveCache(a).contains("Exchange"), aboveCache(a))
      assert(!aboveCache(b).contains("Exchange"), aboveCache(b))
      assert(a.count() > 0 && b.count() > 0)
    } finally {
      ev.unpersist()
      spark.conf.set("spark.sql.adaptive.enabled", "true")
    }
  }

  test("AQE splits a skewed sort-merge join at runtime (skew=true in the final plan)") {
    // the runtime half of the skew story PLANS.md leans on for
    // q95/q99: the PLAN-time remedies (salting, hot-set split) are
    // spelled as queries; this pins that the RUNTIME remedy — AQE
    // detecting an oversized partition and splitting it — actually
    // fires, with the thresholds scaled down to test size
    val prev = Seq("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.autoBroadcastJoinThreshold")
      .map(k => k -> spark.conf.getOption(k)).toMap
    try {
      spark.conf.set(
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16384")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8192")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      // force the sort-merge path: broadcast would absorb the toy
      // build side and no skew split would ever be needed
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // distinct per-row pads: a constant pad LZ4-compresses to
      // nothing and the hot partition's shuffle BYTES never cross the
      // skew threshold (observed: AQE just coalesces)
      val skewed = ((1 to 30000).map(_ => 0L) ++ (1L to 100L))
        .zipWithIndex
        .map { case (k, i) => (k, s"pad-$i-${i * 2654435761L}%09d" * 4) }
        .toDF("key", "pad")
      val dim = (0L to 100L).map(k => (k, s"d$k")).toDF("key", "dval")
      val joined = skewed.join(dim, Seq("key"))
      // execute joined ITSELF (count() would plan a different query
      // and leave joined's adaptive plan unmaterialized)
      assert(joined.collect().length === 30100)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"AQE did not mark the hot-key join skewed:\n${finalPlan.take(3000)}")
    } finally prev.foreach { case (k, v) =>
      v.fold(spark.conf.unset(k))(spark.conf.set(k, _)) }
  }
}
