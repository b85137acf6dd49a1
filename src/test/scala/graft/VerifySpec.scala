package graft

import org.apache.spark.sql.functions._

/** The correctness-dump harness itself: a throwing query must land in
  * verify_errors.json (and the returned failure map) instead of
  * silently vanishing from the round ledger — the round-5 q17 failure
  * mode. */
class VerifySpec extends SparkSpec {

  test("no oracle SQL baked a null from an object-init cycle") {
    // Scala object initializers run on first access; an eager `val
    // xSql` in object A interpolating a member of object B, while B's
    // init (directly or transitively) touches A, sees B's
    // not-yet-assigned field as null and bakes the literal text
    // "null" into the SQL forever (round-10: Text.q164Sql -> Stats
    // mid-init -> Stats.q135Sql -> Text.chunksSqlCte = null; DuckDB
    // then fails with "syntax error at or near null" two objects away
    // from the cause). Break such cycles with `lazy val` on the
    // cross-object edge; this gate catches any regression whatever
    // the init order the test JVM happens to take.
    SparkEntry.queries // force the query map first, as Verify does
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(sql != null, s"$name: oracle SQL itself is null")
      // bare lowercase `null` only: '<null>' literals and identifiers
      // like null_vecs are legitimate SQL
      val bare = "(?<![\\w'<_])null(?![\\w'>_])".r.findFirstIn(sql)
      assert(bare.isEmpty,
        s"$name: oracle SQL contains a lowercase 'null' — almost " +
          "certainly an interpolated not-yet-initialized val " +
          "(object-init cycle); make the cross-object edge lazy")
    }
  }

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
