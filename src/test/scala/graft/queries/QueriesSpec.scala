package graft.queries

import graft.{SparkEntry, SparkSpec}

/** Smoke + plan-shape assertions for the registered query surface.
  * Value-level correctness is enforced by the driver's DuckDB oracle
  * (and tools/check_oracle.py); these tests pin the things the oracle
  * can't see: plan shapes (broadcast, pushdown) and the contract
  * invariants (every query has an oracle, names align).
  */
class QueriesSpec extends SparkSpec {

  val sf = "/root/testdata/sf0.001"

  test("driver contract: oracles cover all exact queries; all run non-empty at sf0.001") {
    // approximate sketch queries are intentionally oracle-less
    val approxOnly = Set("q37_sketches")
    assert(SparkEntry.oracleSql.keySet === SparkEntry.queries.keySet -- approxOnly)
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned 0 rows at sf0.001")
    }
  }

  test("sketch aggregates land within tolerance of exact answers") {
    val approx = Stats.q37Sketches(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    val exact = sql(
      s"""SELECT l_returnflag, count(DISTINCT l_orderkey) AS d,
         |       percentile(l_extendedprice, 0.5) AS m
         |FROM parquet.`$sf/lineitem.parquet` GROUP BY 1""".stripMargin)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getDouble(2))).toMap
    exact.foreach { case (flag, (d, m)) =>
      val (ad, am) = approx(flag)
      assert(math.abs(ad - d).toDouble / d < 0.1, s"$flag distinct: $ad vs $d")
      assert(math.abs(am - m) / m < 0.1, s"$flag median: $am vs $m")
    }
  }

  test("entry() (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("dimension joins broadcast: q10 plan contains BroadcastHashJoin, no SortMergeJoin for dims") {
    val plan = Relational.q10RevenueByNation(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(2000))
  }

  test("filter pushdown reaches the parquet scan in q11") {
    val plan = Relational.q11BrandVolume(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(l_shipdate), " +
      "GreaterThanOrEqual(l_shipdate"), plan.take(3000))
  }

  test("column pruning: q1 parquet scan reads only l_returnflag") {
    val plan = Parity.q1GradeDist(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<l_returnflag:string>"), plan.take(3000))
  }

  test("top-K compiles to TakeOrderedAndProject (no global sort)") {
    val plan = Parity.q6TopTokenDocs(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  test("q41 custom aggregate partial-aggregates BEFORE the exchange (rows never shuffle)") {
    val plan = Dedup.q41SourceSimhash(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("partial_simhash_agg"), plan.take(2000))
  }

  test("q29 broadcast: embeddings scan is joined map-side (no shuffle of corpus)") {
    val plan = Similarity.q29CosineTopK(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), plan.take(2000))
  }
}
