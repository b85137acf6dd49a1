package graft

import graft.queries.{Bpe, Dedup, Text}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Corpus-curation scale stress (round-4 ops): replicates the
  * documents corpus R× into a temp parquet dir — doc_ids offset into
  * disjoint ranges, each replica's sources renamed to fresh feeds
  * (`src4_7`) — and times the curation passes on the inflated corpus:
  *
  *  - q74 span census: the gram table grows linearly with R, but
  *    replication makes EVERY gram cross-doc-duplicated (nd ≥ R), so
  *    the semi-join passes the entire exploded table — the worst case
  *    for the join, the exact shape of a boilerplate-saturated crawl.
  *  - q81 source overlap: feeds grow R× (matrix R²×|src|²); replica
  *    feeds carry identical gram sets, so the matrix must report
  *    8/8 matches for every replica pair — the "src19 is src4 again"
  *    signal the op exists to catch, asserted here at scale.
  *  - q79/q80 BPE train + apply: the corpus pass grows linearly; the
  *    merge rounds stay vocab-bounded (the point of the design).
  *  - q95 bigram surprisal: replication adds NO distinct bigrams, so
  *    the model table is R-invariant; only the corpus-side scoring
  *    join grows (linearly) — the design's scale claim, timed here.
  *  - q98 post-dedup mixture: replicas are exact near-dups, so the
  *    retention policy must collapse the R× corpus back to the SAME
  *    survivor set the unreplicated corpus keeps (the base corpus has
  *    its own near-dup clusters, which dedup also trims) — asserted:
  *    surviving token mass at R× equals surviving token mass at 1×.
  *
  * Usage: CurationStress [reps]   (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object CurationStress {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 10
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()

    val stressDir = s"/tmp/graft_curation_stress_$reps"
    // replica ids must not collide with real ones: derive the stride
    // from the actual corpus (max id + 1), not a fixed constant that a
    // larger SF would silently overflow into
    val base = Tables.documents(spark, sfDir)
      .agg(org.apache.spark.sql.functions.max(col("doc_id"))).head().getLong(0) + 1L
    Tables.documents(spark, sfDir)
      .crossJoin(spark.range(reps).toDF("rep"))
      .select(
        (col("doc_id") + col("rep") * base).as("doc_id"),
        col("text"), col("lang"),
        concat(col("source"), lit("_"), col("rep")).as("source"),
        col("n_chars"))
      .write.mode("overwrite").parquet(s"$stressDir/documents.parquet")

    def time[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }
    def noop(df: org.apache.spark.sql.DataFrame): Long = df.count()

    // untimed warmup (classes + codegen) on the unreplicated corpus
    noop(Dedup.q74CrossdocSpans(spark, sfDir))
    noop(Dedup.q81SourceOverlap(spark, sfDir))
    noop(Bpe.q79BpeMerges(spark, sfDir))
    noop(Bpe.q80BpeTokenize(spark, sfDir))

    val (spanRows, tSpan) = time(noop(Dedup.q74CrossdocSpans(spark, stressDir)))
    // timed region = the matrix query alone; the replica-detection
    // assertion's bookkeeping jobs run after the clock stops
    val (q81Full, tOverlap) = time(
      Dedup.q81SourceOverlap(spark, stressDir)
        .filter(col("matching_minhashes") === Dedup.SourceMinHashes.toLong)
        .count())
    val expectedFull = reps.toLong * (reps - 1) / 2 *
      Tables.documents(spark, sfDir).select(col("source")).distinct().count()
    // every replica pair (same base feed) must report a full match
    assert(q81Full >= expectedFull,
      s"replica feeds not detected: $q81Full full matches < $expectedFull")
    val (_, tTrain) = time(noop(Bpe.q79BpeMerges(spark, stressDir)))
    val (_, tApply) = time(noop(Bpe.q80BpeTokenize(spark, stressDir)))
    noop(Text.q95BigramSurprisal(spark, sfDir)) // warmup
    val (_, tBigram) = time(noop(Text.q95BigramSurprisal(spark, stressDir)))
    // warmup doubles as the 1× reference point
    val refTok = queries.PipelineQ.q98DedupedMixture(spark, sfDir)
      .agg(sum(col("tokens"))).head().getLong(0)
    val (survTok, tMix) = time {
      queries.PipelineQ.q98DedupedMixture(spark, stressDir)
        .agg(sum(col("tokens"))).head().getLong(0)
    }
    // every doc is an exact near-dup of its R-1 replicas, so the
    // policy keeps ONE copy corpus-wide — EXCEPT docs under the LSH
    // shingle floor (< 3 tokens never enter verifiedPairs, so all R
    // copies survive by design). The R× survivor mass must equal the
    // 1× survivor mass plus the (R-1) extra copies of that
    // unclusterable tail (zero in current testdata, but the invariant
    // shouldn't depend on that).
    val shortTok = Tables.documents(spark, sfDir)
      .select(size(split(col("text"), " ")).cast("long").as("n"))
      .filter(col("n") < 3).agg(coalesce(sum(col("n")), lit(0L)))
      .head().getLong(0)
    val expected = refTok + (reps - 1L) * shortTok
    assert(survTok == expected,
      s"dedup must collapse the R× corpus to 1× (+ sub-shingle tail): " +
        s"survivors $survTok != expected $expected (ref $refTok, short $shortTok)")
    println(f"""{"metric":"curation_stress","reps":$reps,"q74_sec":$tSpan%.2f,"q74_rows":$spanRows,"q81_sec":$tOverlap%.2f,"q81_full_matches":$q81Full,"q79_sec":$tTrain%.2f,"q80_sec":$tApply%.2f,"q95_sec":$tBigram%.2f,"q98_sec":$tMix%.2f,"q98_surviving_tokens":$survTok,"sf":"$sfDir"}""")
    spark.stop()
  }
}
