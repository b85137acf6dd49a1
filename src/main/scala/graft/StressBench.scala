package graft

import graft.queries.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dedup-ladder scale stress: replicates the documents corpus R× (each
  * copy keeps its text, doc_ids offset into disjoint ranges) and times
  * the heavy pipeline stages on the inflated corpus. The interesting
  * nonlinearity is QUADRATIC pair growth: every LSH bucket holds R
  * copies of each original member, so candidate pairs grow ~R² while
  * the corpus grows R — exactly the shape a 100 TB near-dup-heavy
  * crawl produces, and the regime where the clustering stages start to
  * dominate. Reports wall seconds AND round counts for both clustering
  * algorithms (q46 propagation vs q55 star contraction): replicated
  * corpora produce dense cliques (propagation's best case), so the
  * round counts quantify how far from the adversarial-chain regime —
  * where q55's O(log n) wins — a real corpus sits.
  *
  * Usage: StressBench [reps]   (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object StressBench {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()

    // doc_id ranges stay disjoint per replica (sf0.1 max doc_id is
    // ~5e3; 1e6 stride leaves 200× headroom for larger tiers)
    def corpus(r: Int) = Tables.documents(spark, sfDir)
      .select(col("doc_id"), col("text"))
      .crossJoin(spark.range(r).toDF("rep"))
      .select((col("doc_id") + col("rep") * 1000000L).as("doc_id"), col("text"))

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }

    // untimed warmup (classes + codegen) on the unreplicated corpus
    Dedup.verifiedPairs(corpus(1)).write.format("noop").mode("overwrite").save()

    val docs = corpus(reps)
    val nDocs = docs.count()
    val (nPairs, tPairs) = time(
      Dedup.verifiedPairs(docs).filter(col("jaccard") >= 0.5).count())
    val ((c46, r46), t46) = time {
      val (df, r) = Dedup.clustersCounted(docs)
      (df.filter(col("is_canonical")).count(), r)
    }
    val ((c55, r55), t55) = time {
      val (df, r) = graft.ops.ConnectedComponents.assignCounted(
        Dedup.verifiedEdges(docs)
          .select(col("doc_a").as("u"), col("doc_b").as("v")))
      (df.select(col("component")).distinct().count(), r)
    }
    assert(c46 == c55, s"cluster counts diverged: q46=$c46 q55=$c55")
    println(f"""{"metric":"dedup_stress","reps":$reps,"docs":$nDocs,"verified_pairs":$nPairs,"pairs_sec":$tPairs%.2f,"clusters":$c46,"q46_rounds":$r46,"q46_sec":$t46%.2f,"q55_rounds":$r55,"q55_sec":$t55%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
