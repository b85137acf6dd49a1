package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ProductQuantizerSpec extends SparkSpec {
  import spark.implicits._

  private val dim = 8
  private val m = 2 // two 4-dim subspaces

  // two clusters per subspace → 4 combinations, ids interleaved so the
  // k=4 seeds (first vec_ids) span several combinations
  private lazy val vecs = {
    val rnd = new scala.util.Random(11)
    def v(lo1: Double, lo2: Double) =
      Seq.fill(4)(lo1 + rnd.nextDouble()) ++ Seq.fill(4)(lo2 + rnd.nextDouble())
    (0 until 48).map { i =>
      (i.toLong, v(if (i % 2 == 0) 0.0 else 10.0, if (i % 3 == 0) 0.0 else 10.0))
    }.toDF("vec_id", "v")
  }

  test("per-subspace training is deterministic across partitionings") {
    val a = ProductQuantizer.train(vecs.repartition(1), dim, m, k = 4, iters = 2, roundDp = 6)
    val b = ProductQuantizer.train(vecs.repartition(7), dim, m, k = 4, iters = 2, roundDp = 6)
    assert(a.map(_.map(_.toSeq).toSeq).toSeq === b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes are in range and every subspace censuses the full corpus") {
    val books = ProductQuantizer.train(vecs, dim, m, k = 4, iters = 2, roundDp = 6)
    val staged = ProductQuantizer.withSubvectors(vecs, "v", m, dim / m)
    val rows = (0 until m).map { s =>
      val (code, err) = ProductQuantizer.codeAndErr(col(s"__sv$s"), books(s))
      staged.select(lit(s).as("sub"), code.as("code"), err.as("err"))
    }.reduce(_ unionByName _)
    val census = rows.groupBy("sub", "code").count().collect()
    census.foreach { r =>
      assert(r.getInt(1) >= 0 && r.getInt(1) < 4, r.toString)
    }
    (0 until m).foreach { s =>
      val total = census.filter(_.getInt(0) == s).map(_.getLong(2)).sum
      assert(total === 48L, s"subspace $s censused $total of 48 vectors")
    }
  }

  test("native PqEncode kernel matches the Column-level reference, interpreted and codegen'd") {
    val books = ProductQuantizer.train(vecs, dim, m, k = 4, iters = 2, roundDp = 6)
    val staged = ProductQuantizer.withSubvectors(vecs, "v", m, dim / m)
    val ref = (0 until m).map { s =>
      val (code, err) = ProductQuantizer.codeAndErr(col(s"__sv$s"), books(s))
      staged.select(col("vec_id"), lit(s).as("subspace"),
        code.as("code"), err.as("err"))
    }.reduce(_ unionByName _)
    val native = vecs.select(col("vec_id"),
        posexplode(graft.functions.PqFunctions.pq_encode(col("v"), books))
          .as(Seq("subspace", "s")))
      .select(col("vec_id"), col("subspace"),
        col("s.code").as("code"), round(col("s.dist"), 6).as("err"))
    assert(rowsOf(native) === rowsOf(ref))
    // and the dist table diagonal agrees with encode's chosen distance
    val viaTable = vecs.select(col("vec_id"),
        graft.functions.PqFunctions.pq_dist_table(col("v"), books).as("t"),
        graft.functions.PqFunctions.pq_encode(col("v"), books).as("e"))
      .select(col("vec_id") +: (0 until m).map(s =>
        (element_at(element_at(col("t"), s + 1),
          element_at(col("e"), s + 1).getField("code") + 1) ===
          element_at(col("e"), s + 1).getField("dist")).as(s"ok$s")): _*)
    viaTable.collect().foreach { r =>
      (1 to m).foreach(i => assert(r.getBoolean(i), r.toString))
    }
  }

  test("a vector shorter than the codebook dimension fails loud, not out-of-bounds") {
    import spark.implicits._
    val books = ProductQuantizer.train(vecs, dim, m, k = 4, iters = 1, roundDp = 6)
    val short = Seq((1L, Array.fill(dim / 2)(0.5))).toDF("vec_id", "v")
      .select(graft.functions.PqFunctions.pq_encode($"v", books))
    // surfaces raw (local eval) or task-wrapped depending on the plan
    val e = intercept[Exception](short.collect())
    val messages = Iterator.iterate(e: Throwable)(_.getCause)
      .takeWhile(_ != null).map(_.getMessage).filter(_ != null).toSeq
    assert(messages.exists(_.contains("pq kernel")),
      s"expected the dimension guard, got: $messages")
  }

  test("trained codebooks reconstruct better than their seeds (Lloyd improves)") {
    val subDim = dim / m
    (0 until m).foreach { s =>
      val sub = vecs.select(col("vec_id"),
        slice(col("v"), s * subDim + 1, subDim).as("v"))
      val seeds = ProductQuantizer.train(vecs, dim, m, k = 4, iters = 0, roundDp = 6)(s)
      val trained = ProductQuantizer.train(vecs, dim, m, k = 4, iters = 2, roundDp = 6)(s)
      assert(KMeans.distortion(sub, trained) <= KMeans.distortion(sub, seeds) + 1e-9)
    }
  }
}
