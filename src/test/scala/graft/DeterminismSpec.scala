package graft

/** Partitioning-invariance gate: every registered query must return
  * IDENTICAL rows when the cluster layout changes — more shuffle
  * partitions, smaller scan splits. This is the distributed-
  * correctness property everything else rests on: a result that
  * depends on partition count or row arrival order is wrong at
  * 100 TB even when it hash-matches the oracle at the driver's fixed
  * local[32] layout (the oracle compare can never see this class of
  * bug — it runs one layout).
  *
  * What this catches: accumulation-order float drift that escapes a
  * rounding guard, first()/head-style nondeterminism, collect_list
  * without a sort, window frames missing a total-order tie-break,
  * approximate aggregates whose merge isn't commutative.
  *
  * Note on memoized models: the vocab/codebook literals (q36/q57/...,
  * q64) are memoized per sf-dir, so the second run reuses the model
  * trained under the first layout — TRAINING-side invariance is not
  * exercised here (KMeans/codebook determinism is pinned by its own
  * specs); SCORING-side invariance is.
  */
class DeterminismSpec extends SparkSpec {

  test("every registered query is partitioning-invariant at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val prevShuffle = spark.conf.get("spark.sql.shuffle.partitions")
    val prevBytes = spark.conf.get("spark.sql.files.maxPartitionBytes")
    val offenders = scala.collection.mutable.ListBuffer[String]()
    // try/finally: the session is JVM-shared across suites — an
    // aborting query must not leak the stress layout into later specs
    try {
      SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
        spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
        val base = rowsOf(fn(spark, sf))
        // prime shuffle count + tiny scan splits: both exchange hashing
        // and scan-task row order change
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        spark.conf.set("spark.sql.files.maxPartitionBytes", "65536")
        val alt = rowsOf(fn(spark, sf))
        if (alt != base) offenders += name
      }
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prevShuffle)
      spark.conf.set("spark.sql.files.maxPartitionBytes", prevBytes)
    }
    assert(offenders.isEmpty,
      s"layout-sensitive queries: ${offenders.mkString(", ")}")
  }
}
