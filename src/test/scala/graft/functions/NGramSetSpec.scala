package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NGramSetSpec extends SparkSpec {
  import spark.implicits._

  test("kernel equals array_distinct(shingles()) on the corpus, order included") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .withColumn("fused", NGramSetFunctions.ngram_set($"toks", 3))
      .withColumn("staged",
        array_distinct(graft.ops.TextOps.shingles($"toks", 3)))
      .select(($"fused" <=> $"staged").as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("ngram_list equals the shingles() HOF on the corpus, order and duplicates included") {
    import org.apache.spark.sql.functions._
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split(col("text"), " "))
      .select(
        (NGramSetFunctions.ngram_list(col("toks"), 5) <=>
          graft.ops.TextOps.shingles(col("toks"), 5)).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("sorted_member_count equals size(array_intersect) on corpus shingle sets") {
    val sh = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .withColumn("shset", NGramSetFunctions.ngram_set($"toks", 3))
    val bench = sh.filter($"doc_id" < 20)
      .agg(array_sort(array_distinct(flatten(collect_list($"shset")))).as("b"))
    val d = sh.crossJoin(broadcast(bench))
      .select((NGramSetFunctions.sorted_member_count($"shset", $"b") ===
        size(array_intersect($"shset", $"b"))).as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("short arrays yield empty set; null yields null; SQL injection works") {
    val rows = Seq((1L, Seq("a", "b")), (2L, null)).toDF("id", "toks")
      .select($"id", NGramSetFunctions.ngram_set($"toks", 3).as("g"))
      .collect().map(r => r.getLong(0) -> Option(r.getSeq[String](1))).toMap
    assert(rows(1L) === Some(Seq.empty))
    assert(rows(2L) === None)
    val viaSql = spark.sql(
      "SELECT ngram_set(array('a','b','a','b','a'), 2) AS g")
      .collect()(0).getSeq[String](0)
    assert(viaSql === Seq("a b", "b a"))
  }
}
