package graft.functions

import graft.SparkSpec
import graft.functions.BottomKSample.bottomk_sample
import org.apache.spark.sql.functions._

class BottomKSampleSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: values of the k smallest (h, v) pairs,
    * sorted ascending. */
  private def sampleOf(ps: Seq[(Long, Long)], k: Int): Seq[Long] =
    ps.distinct.sorted.take(k).map(_._2).sorted

  test("bottomk_sample matches the driver-side reference") {
    val ps = Seq((50L, 9L), (10L, 3L), (30L, 1L), (10L, 3L), (20L, 7L),
      (40L, 2L), (60L, 4L), (5L, 8L))
    val r = ps.toDF("h", "v")
      .agg(bottomk_sample(col("h"), col("v"), 4).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(r === sampleOf(ps, 4))
    assert(r === Seq(3L, 7L, 8L, 1L).sorted) // pairs (5,8)(10,3)(20,7)(30,1)
  }

  test("under-full buffer returns every value; nulls are skipped") {
    val r = Seq((Some(7L), Some(2L)), (None, Some(9L)), (Some(3L), Some(5L)),
      (Some(4L), None))
      .toDF("h", "v")
      .agg(bottomk_sample(col("h"), col("v"), 32).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(r === Seq(2L, 5L))
  }

  test("partition-merge correctness: sample independent of partitioning") {
    // the min-merge property the whole design rides on: bottom-k of a
    // union == bottom-k of merged bottom-ks, under hostile partitioning
    val ps = (1L to 20000L).map(i =>
      (i % 5, (i * 2654435761L) & 0xFFFFFFFFL, i % 997))
    val df1 = ps.toDF("g", "h", "v").repartition(1)
    val df8 = ps.toDF("g", "h", "v").repartition(8, col("h")) // not by group!
    val r1 = rowsOf(df1.groupBy("g")
      .agg(bottomk_sample(col("h"), col("v"), 16).as("s")))
    val r8 = rowsOf(df8.groupBy("g")
      .agg(bottomk_sample(col("h"), col("v"), 16).as("s")))
    assert(r1 === r8)
    val byGroup = ps.groupBy(_._1)
    df1.groupBy("g").agg(bottomk_sample(col("h"), col("v"), 16).as("s"))
      .collect().foreach { row =>
        assert(row.getSeq[Long](1) ===
          sampleOf(byGroup(row.getLong(0)).map(p => (p._2, p._3)), 16))
      }
  }

  test("census on an all-null source fails loudly, naming the source") {
    // every (h, v) pair null → empty sample → the ceil-rank index is 0;
    // without the guard element_at dies with Spark's opaque "SQL array
    // indices start at 1" far from the cause. The census must instead
    // raise a descriptive error carrying the offending source name.
    val pairs = Seq(("bad_src", None: Option[Long], None: Option[Long]),
      ("bad_src", None, None)).toDF("source", "h", "v")
    val exact = Seq(("bad_src", 0L)).toDF("source", "exact_p50")
    val e = intercept[Exception] {
      graft.queries.Stats.sampledQuantileCensus(pairs, exact, 16).collect()
    }
    val msg = Option(e.getMessage).getOrElse("") +
      Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("bad_src") && msg.contains("EMPTY quantile sample"),
      s"expected the descriptive empty-sample error, got: $msg")
  }

  test("sampled median lands near the true median on a uniform stream") {
    // values 1..100k with a multiplicative row hash: the bottom-256
    // sample's ceil-rank p50 must land within ~12% of the true median
    // (binomial rank deviation at k=256, ~4 sigma)
    val ps = (1L to 100000L).map(i => ((i * 2654435761L) & 0xFFFFFFFFL, i))
    val sample = ps.toDF("h", "v")
      .agg(bottomk_sample(col("h"), col("v"), 256).as("s"))
      .collect()(0).getSeq[Long](0)
    assert(sample.size === 256)
    val p50 = sample((256 * 50 + 99) / 100 - 1) // ceil-rank, 0-based
    assert(math.abs(p50 - 50000L) < 12000L,
      s"sampled p50 $p50 too far from the true median 50000")
  }
}
