package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Product quantization (Jégou et al., "Product Quantization for
  * Nearest Neighbor Search", TPAMI 2011 — public literature): split a
  * dim-D vector into M contiguous subvectors and vector-quantize each
  * subspace against its own K-centroid codebook. A float32 vector
  * becomes M small codes — at (D=64, M=8, K=16) that is 8 nibbles vs
  * 256 bytes, a 32× cut for a 100 TB embedding lake, and distances
  * are approximated per-subspace from tiny lookup tables (ADC).
  *
  * Training reuses [[KMeans]] per subspace (same determinism contract
  * as the q36 codebook: deterministic sample + seeds, per-step
  * rounding), so the codebooks can be baked as literals into both the
  * Spark plan and a generated oracle.
  */
object ProductQuantizer {

  /** Train M per-subspace codebooks on (vec_id, v) rows: returns
    * books(m)(k)(d). `dim` must split evenly into m subspaces. */
  def train(emb: DataFrame, dim: Int, m: Int, k: Int, iters: Int,
            roundDp: Int = -1): Array[Array[Array[Double]]] = {
    require(dim % m == 0, s"dim $dim must divide into $m subspaces")
    val subDim = dim / m
    val valid = KMeans.validVectors(emb, dim)
    (0 until m).map { s =>
      val sub = valid.select(col("vec_id"),
        slice(col("v"), s * subDim + 1, subDim).as("v"))
      KMeans.train(sub, k, iters, roundDp)
    }.toArray
  }

  /** Squared L2 distance between a staged subvector column and a
    * literal centroid — same unrolled left-associated sum as
    * KMeans.dist2 (the oracle spells it list_sum(list_transform(...));
    * both fold left to right, so the doubles agree bit-for-bit). */
  def dist2(sv: Column, c: Array[Double]): Column =
    c.zipWithIndex.map { case (w, i) =>
      val d = element_at(sv, i + 1) - lit(w)
      d * d
    }.reduce(_ + _)

  /** Stage the M subvector columns (`__sv0..__sv{m-1}`) — element_at
    * over a staged attribute, not over a re-evaluated slice(...)
    * expression (16 centroids × 8 dims would otherwise recompute the
    * slice 128× per subspace; see the HOF/staging note in
    * graft.queries.Dedup). */
  def withSubvectors(emb: DataFrame, vCol: String, m: Int, subDim: Int): DataFrame =
    (0 until m).foldLeft(emb) { (df, s) =>
      df.withColumn(s"__sv$s", slice(col(vCol), s * subDim + 1, subDim))
    }

  /** (code, err) struct for one staged subvector against one
    * codebook: code = argmin squared-L2 (first-min ties, matching the
    * oracle's `ORDER BY d ASC, cid ASC`), err = that min distance
    * rounded to 6 dp (per-ROW rounding — downstream aggregates of err
    * must stay order-free: min/max, never sums). */
  def codeAndErr(sv: Column, book: Array[Array[Double]]): (Column, Column) = {
    val dists = array(book.map(c => dist2(sv, c)).toSeq: _*)
    ((array_position(dists, array_min(dists)) - 1).cast("int"),
      round(array_min(dists), 6))
  }
}
