package graft

import graft.queries.Similarity
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANN scale stress — the similarity-leg twin of [[StressBench]]:
  * replicates the embeddings corpus R× (disjoint vec_id ranges) and
  * times the four search paths on the inflated corpus for the same 5
  * query vectors:
  *   - exact   (q29 shape): full-corpus native cosine + top-3
  *   - ivf     (q57 shape): nprobe=2 cell-pruned cosine
  *   - adc     (q59 shape): full-corpus PQ table lookups (no vectors)
  *   - ivfpq   (q63 shape): cell-pruned PQ lookups
  * Codebooks are trained ONCE on the base corpus (the production
  * shape: train on a sample, assign at scale), and the cell/code
  * columns are MATERIALIZED FIRST as the index (timed separately as
  * `build_sec`) — search times measure what a query pays against a
  * prebuilt ANN index, which is the only fair comparison: quantizing
  * the corpus costs M·K·subDim multiply-adds per row, paid once at
  * index build, while each query's exact scan pays D multiply-adds
  * per row forever. What should show with R: exact grows linearly in
  * corpus × queries × D; ivf divides candidates by K/nprobe; adc
  * trades D multiply-adds for M lookups; ivfpq compounds both. All
  * four return identical-shape top-3 per query, executed to a count
  * so the whole plan runs.
  *
  * Usage: AnnStress [reps] (SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS)
  */
object AnnStress {
  def main(args: Array[String]): Unit = {
    val reps = if (args.nonEmpty) args(0).toInt else 20
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()

    val cb = Similarity.trainedCodebook(spark, sfDir)
    val books = Similarity.pqBooks(spark, sfDir)
    val m = books.length

    val base = Tables.embeddings(spark, sfDir)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    def corpus(r: Int): DataFrame = base
      .crossJoin(spark.range(r).toDF("rep"))
      .select((col("vec_id") + col("rep") * 1000000L).as("vec_id"), col("v"))
    val queries = base.filter(col("vec_id") < 5)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))

    val cosines = array(cb.map(c =>
      Similarity.cosine(col("v"), array(c.map(lit).toSeq: _*))).toSeq: _*)
    val cell = (array_position(cosines, array_max(cosines)) - 1).cast("int")
    val qCosines = array(cb.map(c =>
      Similarity.cosine(col("qv"), array(c.map(lit).toSeq: _*))).toSeq: _*)

    def top3(scored: DataFrame, scoreCol: String, asc: Boolean): DataFrame = {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(if (asc) col(scoreCol).asc else col(scoreCol).desc,
          col("neighbor_id").asc)
      scored.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    }
    def time(f: => Long): (Long, Double) = {
      val t0 = System.nanoTime()
      val n = f
      (n, (System.nanoTime() - t0) / 1e9)
    }

    def exact(c: DataFrame): Long = top3(
      c.join(broadcast(queries), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          Similarity.cosine(col("qv"), col("v")).as("cos")),
      "cos", asc = false).count()

    // probes: best + masked second-best cell per query (q57 shape) —
    // ONE derivation shared by ivf and ivfpq so both bench rows always
    // measure the same probe policy
    def probesOf(q: DataFrame): DataFrame = q
      .withColumn("cs", qCosines)
      .withColumn("c1", (array_position(col("cs"), array_max(col("cs"))) - 1).cast("int"))
      .withColumn("ms", transform(col("cs"),
        (x, i) => when(i === col("c1"), lit(-2d)).otherwise(x)))
      .withColumn("c2", (array_position(col("ms"), array_max(col("ms"))) - 1).cast("int"))
      .withColumn("probe_cell", explode(array(col("c1"), col("c2"))))
      .drop("cs", "c1", "ms", "c2")

    // search over a PREBUILT (vec_id, v, cell) index
    def ivf(c: DataFrame): Long = top3(
      c.join(broadcast(probesOf(queries)),
          col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          Similarity.cosine(col("qv"), col("v")).as("cos")),
      "cos", asc = false).count()

    import graft.functions.PqFunctions
    val qTabs = queries.select(col("query_id"),
      PqFunctions.pq_dist_table(col("qv"), books).as("__tabs"))
    def codedCorpus(c: DataFrame, withCell: Boolean): DataFrame = {
      val enc = c.withColumn("__enc", PqFunctions.pq_encode(col("v"), books))
      val codeCols = (0 until m).map(i =>
        element_at(col("__enc"), i + 1).getField("code").as(s"__code$i"))
      if (withCell)
        enc.select(col("vec_id") +: cell.as("cell") +: codeCols: _*)
      else enc.select(col("vec_id") +: codeCols: _*)
    }
    val adcSum = (0 until m).map(i =>
      element_at(element_at(col("__tabs"), i + 1), col(s"__code$i") + 1))
      .reduce(_ + _)

    // search over a PREBUILT coded index (vec_id, [cell,] __code0..m)
    def adc(coded: DataFrame): Long = top3(
      coded.join(broadcast(qTabs), col("vec_id") =!= col("query_id"))
        .select(col("query_id"), col("vec_id").as("neighbor_id"),
          adcSum.as("d")),
      "d", asc = true).count()

    def ivfpq(coded: DataFrame): Long = {
      val probes = probesOf(queries).join(qTabs, "query_id")
        .select(col("query_id"), col("__tabs"), col("probe_cell"))
      top3(
        coded.join(broadcast(probes),
            col("cell") === col("probe_cell") && col("vec_id") =!= col("query_id"))
          .select(col("query_id"), col("vec_id").as("neighbor_id"),
            adcSum.as("d")),
        "d", asc = true).count()
    }

    // untimed warmup at R=1 (codegen + class loading)
    {
      val w = corpus(1)
      val wi = w.withColumn("cell", cell).persist()
      val wc = codedCorpus(w, withCell = true).persist()
      Seq(exact(w), ivf(wi), adc(wc.drop("cell")), ivfpq(wc))
      wi.unpersist(); wc.unpersist()
    }

    val c = corpus(reps).persist()
    val nVecs = c.count()
    // index build (one-time): cell assignment + PQ codes — the SAME
    // persisted frames the search paths use below (no reliance on
    // CacheManager plan-matching a rebuilt twin)
    val assigned = c.withColumn("cell", cell).persist()
    val coded = codedCorpus(c, withCell = true).persist()
    val (_, tBuild) = time(assigned.count() + coded.count())
    val (_, tExact) = time(exact(c))
    val (_, tIvf) = time(ivf(assigned))
    val (_, tAdc) = time(adc(coded.drop("cell")))
    val (_, tIvfpq) = time(ivfpq(coded))
    println(f"""{"metric":"ann_stress","reps":$reps,"vectors":$nVecs,""" +
      f""""build_sec":$tBuild%.2f,"exact_sec":$tExact%.2f,"ivf_sec":$tIvf%.2f,""" +
      f""""adc_sec":$tAdc%.2f,"ivfpq_sec":$tIvfpq%.2f,"sf":"$sfDir"}""")
    spark.stop()
  }
}
