package graft

import org.apache.spark.sql.functions._

/** The correctness-dump harness itself: a throwing query must land in
  * verify_errors.json (and the returned failure map) instead of
  * silently vanishing from the round ledger — the round-5 q17 failure
  * mode. */
class VerifySpec extends SparkSpec {

  test("Verify.run records throwing queries and still dumps the healthy ones") {
    val out = java.nio.file.Files.createTempDirectory("graft_verify").toString
    val failures = Verify.run(spark, "/root/testdata/sf0.001", out,
      Map(
        "good_query" -> ((s, d) =>
          Tables.nation(s, d).groupBy(col("n_regionkey"))
            .agg(count(lit(1)).as("n"))),
        "bad_query" -> ((_, _) =>
          throw new IllegalStateException("synthetic failure"))),
      Map("good_query" -> "SELECT 1", "bad_query" -> "SELECT 1"))
    assert(failures.keySet === Set("bad_query"))
    assert(failures("bad_query").contains("synthetic failure"))
    val errJson = java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/verify_errors.json"))
    assert(errJson.contains("\"bad_query\"") &&
      errJson.contains("synthetic failure"), errJson)
    assert(new java.io.File(s"$out/good_query").exists(),
      "healthy query's parquet must still be written")
    assert(spark.read.parquet(s"$out/good_query").count() > 0)
    assert(java.nio.file.Files.readString(
      java.nio.file.Paths.get(s"$out/oracle_sql.json")).contains("good_query"))
  }

  test("Verify.run forces the oracle map only AFTER the query loop") {
    // the k-means-family oracles embed the codebook the queries train
    // (Similarity.lastCodebook): forcing the map first dumps seed
    // centroids and every IVF/PQ compare silently fails (observed as
    // 95/102 when the oracleSql parameter was briefly strict)
    var queriesRan = false
    val out = java.nio.file.Files.createTempDirectory("graft_verify2").toString
    Verify.run(spark, "/root/testdata/sf0.001", out,
      Map("marker" -> ((s, d) => { queriesRan = true; Tables.nation(s, d) })),
      {
        assert(queriesRan,
          "oracleSql was forced before the queries ran — trained-model " +
            "oracles would capture the untrained seed fallback")
        Map("marker" -> "SELECT 1")
      })
  }
}
