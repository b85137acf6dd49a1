package graft.functions

import graft.SparkSpec
import graft.functions.KmvAgg.kmv_agg
import org.apache.spark.sql.functions._

class KmvAggSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: the k smallest distinct values. */
  private def kmvOf(vs: Seq[Long], k: Int): (Long, Long) = {
    val mins = vs.distinct.sorted.take(k)
    (mins.size.toLong, mins.lastOption.getOrElse(0L))
  }

  test("kmv_agg matches the driver-side reference, duplicates collapsed") {
    val vs = Seq(50L, 10L, 30L, 10L, 20L, 40L, 30L, 60L, 5L)
    val r = vs.toDF("h").agg(kmv_agg(col("h"), 4).as("kmv"))
      .select(col("kmv.n"), col("kmv.kth")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === kmvOf(vs, 4))
    assert((r.getLong(0), r.getLong(1)) === (4L, 30L))
  }

  test("under-full buffer reports the exact distinct census") {
    val vs = Seq(7L, 7L, 3L)
    val r = vs.toDF("h").agg(kmv_agg(col("h"), 32).as("kmv"))
      .select(col("kmv.n"), col("kmv.kth")).collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (2L, 7L))
  }

  test("partition-merge correctness: result independent of partitioning") {
    val vs = (1L to 20000L).map(i => (i % 5, (i * 2654435761L) & 0xFFFFFFFFL))
    val df1 = vs.toDF("g", "h").repartition(1)
    val df8 = vs.toDF("g", "h").repartition(8, col("h")) // not by group!
    val r1 = rowsOf(df1.groupBy("g").agg(kmv_agg(col("h"), 16).as("kmv"))
      .select(col("g"), col("kmv.n"), col("kmv.kth")))
    val r8 = rowsOf(df8.groupBy("g").agg(kmv_agg(col("h"), 16).as("kmv"))
      .select(col("g"), col("kmv.n"), col("kmv.kth")))
    assert(r1 === r8) // k-min-of-union == k-min of merged k-mins
    val byGroup = vs.groupBy(_._1)
    r1.foreach { case Seq(g, n, kth) =>
      assert((n.toLong, kth.toLong) === kmvOf(byGroup(g.toLong).map(_._2), 16))
    }
  }

  test("estimate lands near the true distinct count on uniform hashes") {
    // 50k distinct values uniform in [0, 2^32) via a multiplicative hash
    val vs = (1L to 50000L).map(i => (i * 2654435761L) & 0xFFFFFFFFL)
    val r = vs.toDF("h").agg(kmv_agg(col("h"), 256).as("kmv"))
      .select(col("kmv.n"), col("kmv.kth")).collect()(0)
    val est = 255L * 4294967296L / r.getLong(1)
    val exact = vs.distinct.size
    assert(math.abs(est - exact).toDouble / exact < 0.2,
      s"KMV k=256 estimate $est vs exact $exact drifted >20%")
  }

  test("non-long input fails at analysis, not mid-job on executors") {
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      Seq("abc").toDF("s").agg(kmv_agg(col("s"), 4)).collect()
    }
    assert(e.getMessage.contains("BIGINT"), e.getMessage)
  }

  test("SQL surface: kmv_agg installed by GraftExtensions") {
    Seq(1L, 2L, 2L, 3L).toDF("h").createOrReplaceTempView("kmv_in")
    val r = spark.sql(
      "SELECT kmv_agg(h, 2).n AS n, kmv_agg(h, 2).kth AS kth FROM kmv_in")
      .collect()(0)
    assert((r.getLong(0), r.getLong(1)) === (2L, 2L))
  }
}
