package graft.functions

import graft.SparkSpec
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

class HyperplaneSpec extends SparkSpec {
  import spark.implicits._

  private def check(minTests: Int)(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minTests), p)
    assert(res.passed, res.status.toString)
  }

  test("native kernel agrees with the HOF reference on random vectors (property)") {
    val vecGen = Gen.nonEmptyListOf(Gen.chooseNum(-5.0, 5.0))
    check(15)(Prop.forAll(Gen.nonEmptyListOf(vecGen)) { vecs =>
      val df = vecs.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val out = df.select(col("id"),
        Similarity.bucketCode(col("v")).as("native"),
        Similarity.bucketCodeHof(col("v")).as("hof"))
        .collect()
      out.forall(r => r.getLong(1) == r.getLong(2))
    })
  }

  test("bucket code is stable across dim growth (memo table copy-on-write)") {
    // evaluate a short vector, then a longer one, then the short again:
    // the grown weight table must not change earlier dims' weights
    val short = Seq((1L, Seq(1.0, -2.0, 3.0))).toDF("id", "v")
    val long = Seq((1L, (0 until 512).map(i => (i % 7) - 3.0))).toDF("id", "v")
    def codeOf(df: org.apache.spark.sql.DataFrame): Long =
      df.select(Similarity.bucketCode(col("v"))).collect()(0).getLong(0)
    val first = codeOf(short)
    codeOf(long)
    assert(codeOf(short) === first)
  }

  test("code is a packed 8-bit value") {
    val df = Seq((1L, Seq(0.5, -0.25, 1.5, -2.0))).toDF("id", "v")
    val c = df.select(Similarity.bucketCode(col("v"))).collect()(0).getLong(0)
    assert(c >= 0L && c < 256L)
  }
}
