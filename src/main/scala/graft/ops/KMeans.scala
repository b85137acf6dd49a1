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

  /** Drop rows that can't participate in training: null vectors or
    * wrong-dimension vectors (either would crash mid-step — a null
    * cell NPEs the driver collect, a ragged vector makes element_at
    * throw under ANSI mode). */
  def validVectors(emb: DataFrame, dim: Int): DataFrame =
    emb.filter(col("v").isNotNull && size(col("v")) === dim)

  /** L2-normalize the vector column. REQUIRED before training a
    * codebook that q36-style COSINE assignment will consume: Lloyd
    * minimizes L2 distance, and L2-argmin equals cosine-argmax only on
    * unit vectors — training unnormalized and assigning by cosine puts
    * large-norm vectors in the wrong cells and silently hurts IVF
    * recall. (The norm is staged as a column — see the HOF note in
    * graft.queries.Dedup — so it isn't re-summed per element.) */
  def l2Normalize(emb: DataFrame): DataFrame =
    emb.withColumn("__norm",
        sqrt(aggregate(col("v"), lit(0d), (a, x) => a + x * x)))
      .withColumn("v",
        when(col("__norm") > 0, transform(col("v"), x => x / col("__norm")))
          .otherwise(col("v")))
      .drop("__norm")

  /** One Lloyd step: returns updated centroids (empty cells keep their
    * previous centroid). `emb` needs columns (vec_id, v: array<double>). */
  def step(emb: DataFrame, centroids: Array[Array[Double]]): Array[Array[Double]] = {
    val dim = centroids.head.length
    val means = validVectors(emb, dim)
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

  /** Round every coordinate to `dp` decimals (HALF_UP — the same
    * semantics as SQL ROUND). Applied between Lloyd steps when a
    * codebook must be bit-reproducible: `avg` over a shuffle sums in
    * partition order, so raw step output can differ in the last ulp
    * across runs/partitionings; the float noise is ~1e-13 relative
    * while the rounding grid is 1e-6, so rounding collapses every run
    * onto one canonical codebook (an oracle can then bake the exact
    * same literals). */
  def roundCentroids(cs: Array[Array[Double]], dp: Int): Array[Array[Double]] =
    cs.map(_.map(x =>
      BigDecimal(x).setScale(dp, BigDecimal.RoundingMode.HALF_UP).toDouble))

  /** Train k centroids: deterministic init from the k lexicographically
    * first vec_ids, then `iters` Lloyd steps. The input is persisted
    * for the duration — each step re-reads it, and without caching the
    * full upstream lineage (scan + parse + sample) would re-execute
    * iters+1 times. `roundDp >= 0` rounds seeds and every step's output
    * (see roundCentroids) so the trained codebook is identical across
    * runs and partitionings. */
  def train(emb: DataFrame, k: Int, iters: Int, roundDp: Int = -1): Array[Array[Double]] = {
    def canon(cs: Array[Array[Double]]): Array[Array[Double]] =
      if (roundDp >= 0) roundCentroids(cs, roundDp) else cs
    val cached = emb.persist()
    try {
      var cs: Array[Array[Double]] = canon(cached
        .filter(col("v").isNotNull)
        .orderBy(col("vec_id")).limit(k)
        .select(col("v")).collect().map(_.getSeq[Double](0).toArray))
      require(cs.length == k, s"need >= $k vectors to seed $k centroids")
      (0 until iters).foreach(_ => cs = canon(step(cached, cs)))
      cs
    } finally cached.unpersist()
  }

  /** Mean squared distance to the assigned centroid — the quantity
    * Lloyd's algorithm monotonically non-increases; exposed so tests
    * and codebook-quality monitoring can track convergence. */
  def distortion(emb: DataFrame, centroids: Array[Array[Double]]): Double = {
    val ds = array(centroids.map(c => dist2(col("v"), c)).toSeq: _*)
    emb.select(array_min(ds).as("d")).agg(avg(col("d"))).collect()(0).getDouble(0)
  }
}
