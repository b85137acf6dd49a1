package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkSpec {
  import spark.implicits._

  // two tight, well-separated 3-d clusters around (0,0,0) and (10,10,10)
  private lazy val points = {
    val rnd = new scala.util.Random(7)
    val a = (0 until 40).map(i => (i.toLong,
      Seq(rnd.nextDouble(), rnd.nextDouble(), rnd.nextDouble())))
    val b = (0 until 40).map(i => ((100 + i).toLong,
      Seq(10 + rnd.nextDouble(), 10 + rnd.nextDouble(), 10 + rnd.nextDouble())))
    (a ++ b).toDF("vec_id", "v")
  }

  test("train recovers well-separated cluster means") {
    val cs = KMeans.train(points, k = 2, iters = 3)
    val sorted = cs.sortBy(_.sum)
    assert(sorted(0).forall(x => x > -0.5 && x < 1.5), sorted(0).toSeq.toString)
    assert(sorted(1).forall(x => x > 9.5 && x < 11.5), sorted(1).toSeq.toString)
  }

  test("distortion is non-increasing across Lloyd steps") {
    val init = points.orderBy(col("vec_id")).limit(2)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    val d0 = KMeans.distortion(points, init)
    val c1 = KMeans.step(points, init)
    val d1 = KMeans.distortion(points, c1)
    val c2 = KMeans.step(points, c1)
    val d2 = KMeans.distortion(points, c2)
    assert(d1 <= d0 + 1e-9 && d2 <= d1 + 1e-9, s"$d0 -> $d1 -> $d2")
  }

  test("assignment agrees with nearest-centroid by hand") {
    val cs = Array(Array(0.0, 0.0, 0.0), Array(10.0, 10.0, 10.0))
    val out = points.withColumn("cell", KMeans.assignCell(col("v"), cs))
      .select("vec_id", "cell").collect()
    out.foreach { r =>
      val expected = if (r.getLong(0) < 100) 0 else 1
      assert(r.getInt(1) === expected)
    }
  }

  test("null and ragged vectors are excluded instead of crashing the step") {
    val dirty = points.unionByName(
      Seq((900L, null.asInstanceOf[Seq[Double]]), (901L, Seq(1.0)))
        .toDF("vec_id", "v"))
    val cs = KMeans.train(dirty, k = 2, iters = 2)
    assert(!cs.flatten.exists(_.isNaN))
  }

  test("l2Normalize makes L2-argmin match cosine-argmax (the IVF contract)") {
    import graft.queries.Similarity
    // large-norm vector pointing near cluster-A direction: cosine says A,
    // raw L2 says B (it sits closer to B in absolute distance)
    val v = Seq((0L, Seq(30.0, 30.0, 31.0))).toDF("vec_id", "v")
    val cs = Array(Array(0.1, 0.1, 0.2), Array(10.0, 10.0, 10.0))
    val rawCell = v.select(KMeans.assignCell(col("v"), cs)).collect()(0).getInt(0)
    assert(rawCell === 1) // L2 on unnormalized: nearest is B
    val csN = cs.map { c => val n = math.sqrt(c.map(x => x * x).sum); c.map(_ / n) }
    val normCell = KMeans.l2Normalize(v)
      .select(KMeans.assignCell(col("v"), csN)).collect()(0).getInt(0)
    // after normalizing both sides, L2-argmin == cosine-argmax
    val cosCell = v.select(
      when(Similarity.cosine(col("v"),
        array(csN(0).map(lit).toSeq: _*)) >=
        Similarity.cosine(col("v"), array(csN(1).map(lit).toSeq: _*)), 0)
        .otherwise(1)).collect()(0).getInt(0)
    assert(normCell === cosCell)
  }

  test("rounded training is bit-identical across partitionings (the q36 oracle contract)") {
    // avg over a shuffle sums in partition order — without per-step
    // rounding the codebook can differ in the last ulp between runs;
    // the q36 oracle bakes these exact doubles as literals, so they
    // must not depend on physical layout.
    val unit = KMeans.l2Normalize(points)
    val a = KMeans.train(unit.repartition(1), k = 2, iters = 3, roundDp = 6)
    val b = KMeans.train(unit.repartition(7), k = 2, iters = 3, roundDp = 6)
    assert(a.map(_.toSeq).toSeq === b.map(_.toSeq).toSeq)
    // and every coordinate sits exactly on the 1e-6 grid
    a.flatten.foreach { x =>
      assert(x === BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    }
  }

  test("empty cells keep their previous centroid (no NaN poisoning)") {
    // both seeds inside cluster A: cluster-B-less cell must survive the step
    val far = Array(Array(0.5, 0.5, 0.5), Array(500.0, 500.0, 500.0))
    val next = KMeans.step(points, far)
    assert(next(1).toSeq === Seq(500.0, 500.0, 500.0)) // untouched, not NaN
    assert(!next.flatten.exists(_.isNaN))
  }
}
