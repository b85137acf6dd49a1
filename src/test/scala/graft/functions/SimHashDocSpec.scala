package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SimHashDocSpec extends SparkSpec {
  import spark.implicits._

  test("kernel equals the 17-pass HOF spelling on the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 1)
      .withColumn("tok_bits", transform($"toks",
        t => conv(substring(md5(t.cast("binary")), 1, 4), 16, 10).cast("long")))
      .select((SimHashDocFunctions.simhash_doc($"toks") <=>
        graft.queries.Dedup.simhashHof).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("empty array yields null; codes stay in [0, 65536); SQL injection works") {
    val rows = Seq((1L, Seq.empty[String]), (2L, Seq("a")), (3L, Seq("a", "b", "a")))
      .toDF("id", "toks")
      .select($"id", SimHashDocFunctions.simhash_doc($"toks").as("sh"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(rows(1L) === None)
    rows(2L).foreach(v => assert(v >= 0 && v < 65536))
    rows(3L).foreach(v => assert(v >= 0 && v < 65536))
    // a single token's simhash IS its 16-bit md5 prefix (every bit
    // vote is decided by that one token)
    val single = spark.sql("SELECT simhash_doc(array('a')) AS sh").collect()(0).getLong(0)
    val prefix = spark.sql(
      "SELECT conv(substring(md5(cast('a' AS BINARY)), 1, 4), 16, 10) AS p")
      .collect()(0).getString(0).toLong
    assert(single === prefix)
  }
}
