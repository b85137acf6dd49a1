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

  test("q147/q113 stateful runs shuffle only the pruned event columns, never props") {
    import graft.streaming.{StatefulSessions, StatefulTransitions, Streams}
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.streaming.{OutputMode, Trigger}
    // the regression both gates watch: the raw events table — props
    // JSON and value included — crossing a user_id exchange, what the
    // stateful paths degrade to if their column prune is dropped
    val bWide = shuffleBytesOf(
      Tables.events(spark, sf).repartition(col("user_id")))
    val prevParts = spark.conf.get("spark.sql.shuffle.partitions")
    val work = java.nio.file.Files.createTempDirectory("graft_statebytes").toString
    // q147: the whole registered path — ordered feed staging (one
    // narrow range pass) + per-batch state exchanges (a second narrow
    // pass, summed over batches)
    val b147 = shuffleBytesDuring {
      StatefulTransitions.stageOrderedFeed(spark, sf, s"$work/feed", 6)
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        StatefulTransitions.transitions(
            StatefulTransitions.feedStream(spark, s"$work/feed")).writeStream
          .format("noop").option("checkpointLocation", s"$work/ckpt147")
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    // q113: narrower still (user_id, ts)
    val b113 = shuffleBytesDuring {
      Streams.orderedChunkFeed(Tables.events(spark, sf)
        .select(col("user_id").cast("long").as("user_id"),
          col("ts").cast("timestamp_ltz").as("ts")),
        s"$work/feed113", 4, col("ts"))
      try {
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        implicit val ee =
          org.apache.spark.sql.Encoders.product[StatefulSessions.Event]
        StatefulSessions.sessionize(spark.readStream
            .schema(org.apache.spark.sql.types.StructType.fromDDL(
              "user_id bigint, ts timestamp_ltz"))
            .option("maxFilesPerTrigger", "1").parquet(s"$work/feed113")
            .as[StatefulSessions.Event]).writeStream
          .format("noop").option("checkpointLocation", s"$work/ckpt113")
          .outputMode(OutputMode.Append())
          .trigger(Trigger.AvailableNow()).start().awaitTermination()
      } finally spark.conf.set("spark.sql.shuffle.partitions", prevParts)
    }
    assert(b147 > 0 && b113 > 0, "expected state exchanges")
    info(f"q147 stateful shuffle: ${bWide.toDouble / b147}%.1f× under full-width events")
    info(f"q113 stateful shuffle: ${bWide.toDouble / b113}%.1f× under full-width events")
    // each path shuffles the narrow rows ~twice (feed stage + state
    // exchange); the full-width single pass must still dwarf that
    assert(b147 * 2 < bWide,
      s"q147 shuffled $b147 vs $bWide full-width — the column prune regressed")
    assert(b113 * 2 < bWide,
      s"q113 shuffled $b113 vs $bWide full-width — the column prune regressed")
  }

  test("q151 incremental claims shuffle carries fingerprints, never segment text") {
    import graft.streaming.Streams
    import org.apache.spark.sql.functions.{col, explode, expr, greatest, length, lit, min, sequence, struct}
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
    // differential (q24 pattern): the regressed spelling keys claims by
    // the SEGMENT TEXT instead of its md5 fingerprint — same grain,
    // same compression, wider rows
    val bText = shuffleBytesOf(Tables.documents(spark, sf)
      .withColumn("len", length(col("text")))
      .select(col("source"), col("doc_id"),
        explode(sequence(lit(0), greatest(col("len") - 1, lit(0)),
          lit(queries.Dedup.SegW))).as("off"), col("text"))
      .select(col("source"), col("doc_id"), col("off"),
        expr(s"substring(text, off + 1, ${queries.Dedup.SegW})").as("seg"))
      .groupBy(col("seg"))
      .agg(min(struct(col("doc_id"), col("off"), col("source"))).as("first")))
    info(f"q151 claims shuffle: ${bText.toDouble / b}%.1f× under the text-keyed spelling")
    assert(b * 2 < bText,
      s"q151 shuffled $b bytes vs $bText for the text-keyed spelling — " +
        "the fingerprint exchange lost its size advantage")
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
}
