package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.{Prop, Test => SCTest}

class RunStatsSpec extends SparkSpec {
  import spark.implicits._

  private def check(minTests: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  /** Driver-side reference: plain Scala counting, no sorting. */
  private def reference(grams: Seq[String]): Option[(Long, Long)] =
    if (grams.isEmpty) None
    else {
      val counts = grams.groupBy(identity).values.map(_.size.toLong)
      Some((counts.max, counts.filter(_ > 1).sum))
    }

  test("kernel matches the count-based reference (property)") {
    // small alphabet so duplicates actually occur; non-ASCII entries
    // prove the counts don't depend on the kernel's binary sort order
    // matching any particular collation (any total order gives the
    // same equal-element runs)
    val gen = org.scalacheck.Gen.listOf(
      org.scalacheck.Gen.oneOf("a", "b", "c", "a b", "b c", "", "é", "中文", "ß"))
    check(30)(Prop.forAll(org.scalacheck.Gen.listOf(gen)) { docs =>
      val df = docs.zipWithIndex.map { case (g, i) => (i.toLong, g) }
        .toDF("id", "g")
      val out = df.select($"id", RunStatsFunctions.run_stats($"g").as("rs"))
        .select($"id", $"rs.max_run", $"rs.dup_positions")
        .collect()
        .map(r => r.getLong(0) ->
          (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2)))))
        .toMap
      docs.zipWithIndex.forall { case (g, i) =>
        out(i.toLong) == reference(g)
      }
    })
  }

  test("kernel equals the HOF run-length reference on the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .filter(size($"toks") >= 3)
      .withColumn("tri", graft.ops.TextOps.shingles($"toks", 3))
      .withColumn("rs", RunStatsFunctions.run_stats($"tri"))
      .withColumn("srt", array_sort($"tri"))
      .select(
        $"rs.max_run" === graft.queries.Text.maxRunLength($"srt"),
        $"rs.dup_positions" === graft.queries.Text.dupPositions($"srt"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0) && r.getBoolean(1)))
  }

  test("fused n-gram path equals shingles() + run_stats on the corpus") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .withColumn("toks", split($"text", " "))
      .withColumn("fused", RunStatsFunctions.ngram_run_stats($"toks", 3))
      .withColumn("staged",
        RunStatsFunctions.run_stats(graft.ops.TextOps.shingles($"toks", 3)))
      .select(($"fused" <=> $"staged").as("eq"))
      .collect()
    assert(d.nonEmpty)
    d.foreach(r => assert(r.getBoolean(0)))
  }

  test("interpreted eval agrees with codegen; SQL function is injected") {
    val expr = RunStats(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("x", "y", "x", "x", "z", "y"),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    val interpreted = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.InternalRow]
    assert(interpreted.getLong(0) === 3L) // "x" run
    assert(interpreted.getLong(1) === 5L) // 3 x's + 2 y's
    val viaSql = spark.sql(
      "SELECT run_stats(array('x','y','x','x','z','y')) AS rs")
      .select("rs.max_run", "rs.dup_positions").collect()(0)
    assert((viaSql.getLong(0), viaSql.getLong(1)) === (3L, 5L))
  }
}
