package graft.functions

import graft.SparkSpec
import graft.functions.SimHashAgg.simhash_agg
import org.apache.spark.sql.functions._

class SimHashAggSpec extends SparkSpec {
  import spark.implicits._

  /** Reference implementation on the driver. */
  private def simhashOf(codes: Seq[Long]): Long = {
    (0 until 16).foldLeft(0L) { (h, b) =>
      val votes = codes.map(c => if (((c >> b) & 1L) == 1L) 1L else -1L).sum
      if (votes > 0) h | (1L << b) else h
    }
  }

  test("simhash_agg matches the driver-side reference computation") {
    val codes = Seq(0xABCDL, 0x1234L, 0xF0F0L, 0x0F0FL, 0xABCDL)
    val got = codes.toDF("code").agg(simhash_agg(col("code"))).collect()(0).getLong(0)
    assert(got === simhashOf(codes))
  }

  test("partition-merge correctness: result is independent of partitioning") {
    val codes = (1L to 10000L).map(i => (i % 7, (i * 2654435761L) & 0xFFFFL))
    val df1 = codes.toDF("g", "code").repartition(1)
    val df8 = codes.toDF("g", "code").repartition(8, col("code")) // not by group!
    val r1 = rowsOf(df1.groupBy("g").agg(simhash_agg(col("code")).as("h")))
    val r8 = rowsOf(df8.groupBy("g").agg(simhash_agg(col("code")).as("h")))
    assert(r1 === r8) // partial buffers merged associatively
    // and matches the reference per group
    val byGroup = codes.groupBy(_._1)
    r1.foreach { case Seq(g, h) =>
      assert(h.toLong === simhashOf(byGroup(g.toLong).map(_._2)))
    }
  }

  test("non-long input fails at analysis, not mid-job on executors") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("abc").toDF("s").agg(simhash_agg(col("s"))).collect()
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("nulls are ignored; empty group yields 0 (no set bits)") {
    val got = Seq[Option[Long]](None, None).toDF("code")
      .agg(simhash_agg(col("code"))).collect()(0).getLong(0)
    assert(got === 0L)
  }

  test("identical token multisets → identical simhash; near sets → near hash") {
    val a = Seq(1L, 2L, 3L, 0xFFL, 0xAAL)
    val b = scala.util.Random.shuffle(a)
    assert(simhashOf(a) === simhashOf(b)) // order-insensitive
  }
}
