package graft.functions

import graft.SparkSpec
import graft.ops.TextOps
import org.apache.spark.sql.functions._

class TokenCodesSpec extends SparkSpec {
  import spark.implicits._

  test("token_codes equals the HOF conv/substring/md5 spelling (4 and 8 hex chars)") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .select(
        (TokenCodesFunctions.token_codes($"toks", 4) <=>
          TextOps.tokenCodes16($"toks")).as("eq16"),
        (TokenCodesFunctions.token_codes($"toks", 8) <=>
          TextOps.tokenCodes($"toks")).as("eq32"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0) && r.getBoolean(1)))
  }

  test("rolling_fingerprint equals the staged HOF fold on the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .select(
        (TokenCodesFunctions.rolling_fingerprint(
          $"toks", TextOps.RollB, TextOps.RollM) <=>
          TextOps.rollingFingerprint(TextOps.tokenCodes($"toks"))).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("empty token array folds to 0; null tokens poison the fold to null") {
    val rows = Seq(
      (1L, Some(Seq.empty[String])),
      (2L, Some(Seq("a", null, "b"))),
      (3L, None: Option[Seq[String]]))
      .toDF("id", "toks")
      .select($"id", TokenCodesFunctions.rolling_fingerprint(
        $"toks", TextOps.RollB, TextOps.RollM).as("rfp"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(rows(1L) === Some(0L))
    assert(rows(2L) === None)
    assert(rows(3L) === None)
  }
}
