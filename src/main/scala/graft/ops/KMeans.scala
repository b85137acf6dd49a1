package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Lloyd's k-means on DataFrames — trains the IVF coarse-quantizer
  * codebook (graft.queries.Similarity.q36 assigns against a fixed
  * codebook; this is where the codebook comes from). No MLlib: the
  * whole step is assign (scan-side, centroids as literals — no join)
  * → per-cell elementwise mean (posexplode + one shuffle on
  * (cell, dim)) → collect k×dim doubles to the driver.
  *
  * Scale shape: training runs on a SAMPLE (standard practice — the
  * codebook needs thousands of points per cell, not the corpus), so
  * the per-iteration shuffle is sample_size × dim rows. Assignment of
  * the full 100 TB corpus remains the scan-side literal argmin from
  * q36 — the expensive side never shuffles.
  */
object KMeans {

  /** Squared L2 distance between a vector column and a literal
    * centroid, unrolled as a codegen'd expression. */
  private def dist2(v: Column, c: Array[Double]): Column =
    c.zipWithIndex.map { case (w, i) =>
      val d = element_at(v, i + 1) - lit(w)
      d * d
    }.reduce(_ + _)

  /** Nearest-centroid id (ties → lowest id, deterministic). */
  def assignCell(v: Column, centroids: Array[Array[Double]]): Column = {
    val ds = array(centroids.map(c => dist2(v, c)).toSeq: _*)
    (array_position(ds, array_min(ds)) - 1).cast("int")
  }

  /** One Lloyd step: returns updated centroids (empty cells keep their
    * previous centroid). `emb` needs columns (vec_id, v: array<double>). */
  def step(emb: DataFrame, centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = centroids.head.length
    val means = emb
      .withColumn("cell", assignCell(col("v"), centroids))
      .select(col("cell"), posexplode(col("v")).as(Seq("dim", "x")))
      .groupBy(col("cell"), col("dim"))
      .agg(avg(col("x")).as("m"))
      .collect()
    val next = centroids.map(_.clone())
    means.foreach { r =>
      next(r.getInt(0))(r.getInt(1)) = r.getDouble(2)
    }
    next
  }

  /** Train k centroids: deterministic init from the k lexicographically
    * first vec_ids, then `iters` Lloyd steps. */
  def train(emb: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var cs: Array[Array[Double]] = emb.orderBy(col("vec_id")).limit(k)
      .select(col("v")).collect().map(_.getSeq[Double](0).toArray)
    require(cs.length == k, s"need >= $k vectors to seed $k centroids")
    (0 until iters).foreach(_ => cs = step(emb, cs))
    cs
  }

  /** Mean squared distance to the assigned centroid — the quantity
    * Lloyd's algorithm monotonically non-increases; exposed so tests
    * and codebook-quality monitoring can track convergence. */
  def distortion(emb: DataFrame, centroids: Array[Array[Double]]): Double = {
    val ds = array(centroids.map(c => dist2(col("v"), c)).toSeq: _*)
    emb.select(array_min(ds).as("d")).agg(avg(col("d"))).collect()(0).getDouble(0)
  }
}
