package graft

import java.util.concurrent.atomic.AtomicLong
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}
import org.apache.spark.sql.DataFrame

/** MEASURED shuffle-byte gates: PlanSpec pins plan shapes; these pin
  * the bytes that actually crossed the wire, via task metrics. The
  * claims under test are the load-bearing "only X crosses the
  * shuffle" lines in the scale-shape docs — a regression that keeps
  * the plan shape but widens the shuffled payload (a dropped column
  * prune, a fingerprint swapped back to text) passes every plan gate
  * and fails here.
  *
  * Methodology: a TaskEnd listener accumulates shuffle WRITE bytes
  * (write ≈ read for a completed job, and write is attributed even if
  * AQE re-plans readers); the bus is drained by polling the counter
  * until stable. Bounds are asserted at sf0.01 against the corpus'
  * own byte size, with the margins stated inline.
  */
class ShuffleMetricsSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.01"

  /** Total shuffle bytes written while `run` executes (any number of
    * jobs — streaming micro-batches included). */
  private def shuffleBytesDuring(run: => Unit): Long = {
    val bytes = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          bytes.addAndGet(t.taskMetrics.shuffleWriteMetrics.bytesWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      run
      // drain the async listener bus: poll until stable for 500 ms
      var last = -1L
      var stableSince = System.nanoTime()
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (System.nanoTime() < deadline &&
             (bytes.get() != last ||
              System.nanoTime() - stableSince < 500000000L)) {
        if (bytes.get() != last) { last = bytes.get(); stableSince = System.nanoTime() }
        Thread.sleep(50)
      }
      bytes.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  /** Total shuffle bytes written while running `df` to the noop sink. */
  private def shuffleBytesOf(df: => DataFrame): Long =
    shuffleBytesDuring(df.write.format("noop").mode("overwrite").save())

  /** Total shuffle RECORDS written while running `df` — the metric for
    * combine-grain claims ("≤k rows per partition cross the wire"),
    * where a bytes differential is compression-confounded: repetitive
    * text lz4-collapses while hash buffers stay incompressible. */
  private def shuffleRecordsOf(df: => DataFrame): Long = {
    val records = new AtomicLong(0L)
    val listener = new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null)
          records.addAndGet(t.taskMetrics.shuffleWriteMetrics.recordsWritten)
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      df.write.format("noop").mode("overwrite").save()
      var last = -1L
      var stableSince = System.nanoTime()
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (System.nanoTime() < deadline &&
             (records.get() != last ||
              System.nanoTime() - stableSince < 500000000L)) {
        if (records.get() != last) { last = records.get(); stableSince = System.nanoTime() }
        Thread.sleep(50)
      }
      records.get()
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  private lazy val corpusTextBytes: Long =
    Tables.documents(spark, sf)
      .agg(org.apache.spark.sql.functions.sum(
        org.apache.spark.sql.functions.octet_length(
          org.apache.spark.sql.functions.col("text")))).head().getLong(0)

  test("q24 exact dedup shuffles fingerprints, never text (differential baseline)") {
    import org.apache.spark.sql.functions.{col, count, lit}
    val b = shuffleBytesOf(queries.Text.q24Fingerprints(spark, sf))
    assert(b > 0, "expected a fingerprint exchange")
    // DIFFERENTIAL bound: shuffle bytes are lz4-compressed, so an
    // uncompressed-corpus comparison would be unsound (compressed
    // text can slip under it). Measure the regressed text-keyed
    // spelling under the SAME compression and demand a real gap —
    // ~300-char docs compress to ~3× a 32-hex digest row.
    val bText = shuffleBytesOf(Tables.documents(spark, sf)
      .groupBy(col("text")).agg(count(lit(1))))
    assert(b * 2 < bText,
      s"q24 shuffled $b bytes vs $bText for the text-keyed spelling — " +
        "the fingerprint exchange lost its size advantage")
  }

  /** The row-grain regression both token-side gates compare against:
    * the exploded token stream crossing the wire un-combined — what a
    * lost map-side partial aggregation degrades to. Measured under the
    * SAME codec/partition config as the query under test, so the gates
    * are differential (a legitimate config change moves both sides)
    * instead of absolute byte ceilings that break on a codec bump. */
  private lazy val tokenStreamBytes: Long = {
    import org.apache.spark.sql.functions.{col, explode}
    shuffleBytesOf(Tables.documents(spark, sf)
      .select(col("source"), explode(ops.TextOps.tokens(col("text"))).as("t"))
      // mirror q68's empty-token cut so the baseline is the gated
      // queries' exact token grain (round-8 advice — keeping empties
      // inflated the baseline and loosened both gates)
      .filter(col("t") =!= "")
      .repartition(col("source")))
  }

  test("q68 CMS shuffle is sketch-sized: O(d×w) cells per task, not corpus-sized") {
    val b = shuffleBytesOf(queries.Stats.q68CmsHeavyHitters(spark, sf))
    assert(b > 0, "expected a cell exchange")
    // differential: the sketch's map-side cell combine (plus the
    // top-10 audit's vocab-grain partials) must stay well under the
    // un-combined token stream it exists to avoid. Margin ×32 (round-8
    // advice: ×8 would let a ~10× combine regression pass) — measured
    // ratio at sf0.01 is ~97×, logged for drift visibility.
    info(f"q68 shuffle ratio: ${tokenStreamBytes.toDouble / b}%.0f× under the token stream")
    assert(b * 32 < tokenStreamBytes,
      s"q68 shuffled $b bytes vs $tokenStreamBytes for the raw token " +
        "stream — the map-side cell combine regressed")
  }

  test("q97 mixture shuffle is O(sources × tasks): token totals, never tokens") {
    val b = shuffleBytesOf(queries.Text.q97MixtureWeights(spark, sf))
    assert(b > 0, "expected a totals exchange")
    // differential: per-source TOTALS vs the token rows themselves
    // (×32 margin and ratio log, as in the q68 gate)
    info(f"q97 shuffle ratio: ${tokenStreamBytes.toDouble / b}%.0f× under the token stream")
    assert(b * 32 < tokenStreamBytes,
      s"q97 shuffled $b bytes vs $tokenStreamBytes for the raw token " +
        "stream — per-source partials regressed to row grain")
  }

  test("q147/q113 stateful exchanges carry only the pruned event columns, never props") {
    // a BYTES differential is blind to this prune: the events table's
    // props JSON is so repetitive that lz4 flattens a 5× uncompressed
    // width difference to ~1.3× (measured), while at 100 TB the
    // UNCOMPRESSED width is what sizes the exchange's memory and spill.
    // So this gate pins the exchange SCHEMA of the live micro-batch
    // plan: every shuffle feeding the stateful operator must carry
    // only the operator's declared columns — props/value appearing in
    // any exchange output is the regression.
    import graft.streaming.StatefulTransitions
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
    import org.apache.spark.sql.execution.streaming.runtime.StreamingQueryWrapper
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val work = java.nio.file.Files.createTempDirectory("graft_stateplan").toString
    StatefulTransitions.stageOrderedFeed(spark, sf, s"$work/feed", 2)
    val q = StatefulTransitions.transitions(
        StatefulTransitions.feedStream(spark, s"$work/feed")).writeStream
      .format("noop").option("checkpointLocation", s"$work/ckpt")
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow()).start()
    val exec =
      try { q.awaitTermination();
        q.asInstanceOf[StreamingQueryWrapper].streamingQuery.lastExecution }
      finally q.stop()
    val shuffles = exec.executedPlan.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty, "expected a state exchange in the batch plan")
    shuffles.foreach { s =>
      val cols = s.output.map(a => (a.name, a.dataType))
      // NB the groupByKey(Long) KEY attribute is also named "value"
      // (LongType) — the banned column is the events table's DOUBLE
      // `value`, so the check is (name, type)-exact
      val widened = cols.exists { case (n, t) =>
        n == "props" ||
          (n == "value" && t == org.apache.spark.sql.types.DoubleType)
      }
      assert(!widened,
        s"stateful exchange widened to $cols — the column prune regressed " +
          "(props/value must never cross the state shuffle)")
    }
  }

  test("q151 ingest exchange budget stays under corpus bytes across all batches") {
    import graft.streaming.Streams
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    val work = java.nio.file.Files.createTempDirectory("graft_claimbytes").toString
    // chunk staging is harness scaffolding (it round-robins raw text);
    // stage OUTSIDE the measurement so the gate sees only the monitor's
    // own exchanges: per-batch first-claims (fp-keyed) + doc totals
    Tables.documents(spark, sf).select(col("source"), col("doc_id"), col("text"))
      .repartition(4).write.parquet(s"$work/chunks")
    val b = shuffleBytesDuring {
      Streams.incrementalSegmentDedup(
        spark.readStream
          .schema(org.apache.spark.sql.types.StructType.fromDDL(
            "source string, doc_id bigint, text string"))
          .option("maxFilesPerTrigger", "1").parquet(s"$work/chunks"),
        s"$work/claims", s"$work/docs", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start().awaitTermination()
    }
    assert(b > 0, "expected claim exchanges")
    // budget pin, the q134 gate's rationale at the streaming grain: a
    // compressed ~100-char segment row is roughly a 32-hex digest row
    // (measured: the text-keyed spelling shuffles within ~10% of the
    // fp-keyed one at sf0.01), so a text-vs-fp differential is blind
    // here — what this gate CAN catch is exchange-count / row-width
    // growth: the whole ingest run's claims + totals shuffles, summed
    // over every micro-batch, must stay under the corpus' own bytes
    info(f"q151 ingest shuffled $b bytes vs corpus $corpusTextBytes")
    assert(b < corpusTextBytes,
      s"q151 shuffled $b bytes vs corpus $corpusTextBytes — the per-batch " +
        "exchange budget grew (an extra exchange or a widened claim row)")
  }

  test("q155 sample-side shuffle is O(k × sources): bottom-k partials, never doc rows") {
    import org.apache.spark.sql.functions.col
    // the PRODUCTION path alone (the exact-median audit is the
    // documented 100 TB drop — its window exchange is O(docs) by
    // design and would drown the signal): the kernel agg's map-side
    // bottom-k combine must shrink each partition's contribution to
    // ≤k pairs before the exchange. Measured on a generated 200k-row
    // frame, not the sf corpus — at sf0.01 the corpus (500 docs) is
    // SMALLER than the partial-slot capacity (partitions × sources ×
    // k), so the combine has nothing to combine and the differential
    // cannot show; the property under test is scale-shape, and it
    // needs rows >> slots to be visible
    import org.apache.spark.sql.functions.expr
    val pairs = spark.range(200000).select(
      (col("id") % 4).cast("string").as("source"),
      expr("cast(conv(substring(md5(cast(id as string)), 1, 15), 16, 10) " +
        "as bigint)").as("h"),
      (col("id") % 997).as("v"))
    val b = shuffleBytesOf(pairs.groupBy(col("source"))
      .agg(graft.functions.BottomKSample.bottomk_sample(
        col("h"), col("v"), queries.Stats.QuantileRegK).as("s")))
    assert(b > 0, "expected a partial-sample exchange")
    // differential: the un-combined (source, h, v) row stream — what a
    // lost partial aggregation degrades to
    val bRows = shuffleBytesOf(pairs.repartition(col("source")))
    info(f"q155 shuffle ratio: ${bRows.toDouble / b}%.0f× under the pair stream")
    assert(b * 32 < bRows,
      s"q155 sample shuffled $b bytes vs $bRows for the raw pair stream — " +
        "the map-side bottom-k combine regressed")
  }

  test("q134 segment dedup shuffle carries fingerprint rows, bounded by corpus bytes") {
    val b = shuffleBytesOf(queries.Dedup.q134SegmentDedup(spark, sf))
    assert(b > 0)
    // ceiling bound: both corpus-grain exchanges together stay under
    // the corpus' own (uncompressed) bytes. NOTE this is a budget
    // pin, not a text-regression detector — at 100-char segments a
    // compressed text row shrinks to roughly a 32-hex digest row, so
    // only the q24 differential gate above can SEE a text swap; this
    // gate catches exchange-count/row-width growth.
    assert(b < corpusTextBytes,
      s"q134 shuffled $b bytes vs corpus $corpusTextBytes — the exchange budget grew")
  }

  test("q172 survivor choice is cap-bounded per fingerprint before the shuffle") {
    import org.apache.spark.sql.functions.{col, expr, row_number}
    import org.apache.spark.sql.expressions.Window
    // The scale claim under test: the bottom-k kernel's MAP-SIDE
    // partials collapse each input partition's copies of a fingerprint
    // to ≤cap rows before the exchange, so a boilerplate page
    // duplicated 10⁹× shuffles cap·partitions rows, not 10⁹. The sf
    // corpora barely duplicate, so measure in the regime the cap
    // exists for: every sf0.001 doc replicated 64× under fresh row
    // ids across 4 input partitions — the window spelling (the
    // oracle's, and the regression a refactor would slide back to)
    // must shuffle the full 64 rows/fp; the kernel ≤ cap·4 = 12.
    val R = 64
    val base = Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("doc_id"), col("source"), col("text"))
    val hot = queries.Dedup.cappedDocsOf(
      base.crossJoin(spark.range(R).select(col("id").as("rep")))
        .withColumn("doc_id", expr(s"doc_id * $R + rep")).drop("rep"))
      .repartition(4).localCheckpoint(true) // pin layout; exclude build cost
    val cap = queries.Dedup.DupCap
    // the survivor-choice stage alone: the doc_id semi-join both
    // spellings share is O(corpus) but evenly keyed (doc_id is
    // unique) — including it would drown the stage this gate pins.
    // RECORDS, not bytes: the 64 replicas are byte-identical text, so
    // lz4 collapses the window's corpus-grain exchange to within ~1.2×
    // of the kernel's incompressible hash buffers — a bytes
    // differential is blind here (the q151 note, inverted); the claim
    // is row-grain ("≤ cap·partitions rows per fp"), so count rows.
    val rKernel = shuffleRecordsOf(
      hot.groupBy(col("fp")).agg(graft.functions.BottomKSample
        .bottomk_sample(col("h"), col("doc_id"), cap).as("ids")))
    def windowSpelling = {
      val w = Window.partitionBy(col("fp")).orderBy(col("h"), col("doc_id"))
      hot.withColumn("rn", row_number().over(w)).filter(col("rn") <= cap)
    }
    // Spark 4's InferWindowGroupLimit gives the rank-window spelling
    // its own map-side cut (cap rows/fp/partition — measured below,
    // exactly cap× the kernel's one-buffer-row/fp/partition); the
    // REGRESSION a lost combine degrades to is the un-inferred window
    // shuffling the whole corpus, so that is the differential's far side
    val rWindowOpt = shuffleRecordsOf(windowSpelling)
    val excludeKey = "spark.sql.optimizer.excludedRules"
    val prev = spark.conf.getOption(excludeKey)
    val rWindowRaw = try {
      spark.conf.set(excludeKey,
        "org.apache.spark.sql.catalyst.optimizer.InferWindowGroupLimit")
      shuffleRecordsOf(windowSpelling)
    } finally prev match {
      case Some(v) => spark.conf.set(excludeKey, v)
      case None => spark.conf.unset(excludeKey)
    }
    assert(rKernel > 0 && rWindowOpt > 0 && rWindowRaw > 0)
    info(f"q172 shuffle records: kernel $rKernel, group-limited window " +
      f"$rWindowOpt (${rWindowOpt.toDouble / rKernel}%.1f×), raw window " +
      f"$rWindowRaw (${rWindowRaw.toDouble / rKernel}%.1f×)")
    assert(rKernel < rWindowOpt,
      s"q172 kernel shuffled $rKernel records vs $rWindowOpt for even the " +
        "group-limited window — the one-buffer-per-fp partial regressed")
    assert(rKernel * 4 < rWindowRaw,
      s"q172 kernel shuffled $rKernel records vs $rWindowRaw for the " +
        "un-combined window on a 64×-duplicated corpus — the map-side " +
        "cap combine regressed")
  }
}
