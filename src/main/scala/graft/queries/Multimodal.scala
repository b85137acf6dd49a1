package graft.queries

import graft.Tables
import graft.ops.{Multimodal => MM, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-pipeline queries: binary payload columns + decoded
  * metadata stats (decode stub is deterministic — see
  * [[graft.ops.Multimodal]]).
  */
object MultimodalQ {

  /** Image-metadata rollup: decode (stub) → per-format resolution
    * stats. Oracle recomputes the same md5-derived fields in SQL. */
  def q32ImageMetaStats(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .transform(MM.withPayload)
      .withColumn("meta", MM.decodeImageMeta(col("payload")))
      .select(col("meta.format").as("format"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.channels").as("channels"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("image_count"),
        round(avg(col("width")), 2).as("avg_width"),
        round(avg(col("height")), 2).as("avg_height"),
        sum(col("channels")).as("total_channels"))
  }
  /** The stub decoder's md5 contract in DuckDB — ONE copy shared by
    * every multimodal oracle (offsets/moduli must match
    * [[graft.ops.Multimodal.decodeImageMeta]]). plen is PAYLOAD BYTES:
    * octet_length of the text blob, NOT length(text) — those differ
    * on any non-ASCII character and the Spark side measures the
    * binary payload. */
  private val metaCte: String =
    """meta AS (
      |  SELECT source, doc_id,
      |         len(str_split(text, ' ')) AS text_toks,
      |         CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 1920 AS width,
      |         CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 1080 AS height,
      |         CAST('0x' || substr(md5(text), 9, 2) AS INTEGER) % 3 + 1 AS channels,
      |         CASE WHEN CAST('0x' || substr(md5(text), 11, 2) AS INTEGER) % 2 = 0
      |              THEN 'png' ELSE 'jpeg' END AS format,
      |         octet_length(CAST(text AS BLOB)) AS plen
      |  FROM documents)""".stripMargin

  val q32Sql: String =
    s"""WITH $metaCte
      |SELECT format, count(*) AS image_count,
      |       round(avg(width), 2) AS avg_width,
      |       round(avg(height), 2) AS avg_height,
      |       CAST(sum(channels) AS BIGINT) AS total_channels
      |FROM meta GROUP BY 1""".stripMargin

  /** Mixed-codec census (q212) — BOTH real header codecs on the
    * oracle board at once: every payload is serialized into a REAL
    * container (even doc_ids a 54-byte BMP, odd a netpbm P6/P5 —
    * channels==1 graymaps take P5, the format's own contract) and the
    * census reads width/height/channels from the BYTE parse
    * (`coalesce(decodeBmpMeta, decodePpmMeta)` — the format sniff a
    * real ingest runs), never from the stub. A green oracle row means
    * both fixed-offset binary (BMP) and ASCII-header (netpbm) parsing
    * reproduce the encoder's dims exactly; a parser regression breaks
    * the hash. Scale shape: encode+sniff+parse are scan-side codegen'd
    * string/binary functions, the only shuffle is the O(formats)
    * census agg. */
  def q212MixedCodecCensus(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .transform(MM.withPayload)
      .withColumn("stub", MM.decodeImageMeta(col("payload")))
      .withColumn("enc",
        when(col("doc_id") % 2 === 0,
          MM.encodeBmpPayload(col("stub"), col("payload")))
          .otherwise(MM.encodePpmPayload(col("stub"), col("payload"))))
      .withColumn("meta",
        coalesce(MM.decodeBmpMeta(col("enc")), MM.decodePpmMeta(col("enc"))))
      .select(col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.channels").as("channels"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("image_count"),
        round(avg(col("width")), 2).as("avg_width"),
        round(avg(col("height")), 2).as("avg_height"),
        sum(col("channels")).cast("long").as("total_channels"))
  val q212Sql: String =
    s"""WITH $metaCte
       |SELECT CASE WHEN doc_id % 2 = 0 THEN 'bmp'
       |            WHEN channels = 1 THEN 'pgm' ELSE 'ppm' END AS format,
       |       count(*) AS image_count,
       |       round(avg(width), 2) AS avg_width,
       |       round(avg(height), 2) AS avg_height,
       |       CAST(sum(CASE WHEN doc_id % 2 = 0 THEN channels
       |                     WHEN channels = 1 THEN 1 ELSE 3 END)
       |         AS BIGINT) AS total_channels
       |FROM meta GROUP BY 1""".stripMargin

  /** Frame-sampling manifest (q67) — the video-shaped pipeline
    * composed end-to-end: decode (stub) → resize to a 256×256 box
    * (integer-permille aspect-preserving math, oracle-exact) → sample
    * a frame offset every 64 payload bytes → per-format manifest of
    * images, total sampled frames, and the resized dimension envelope.
    * This is the shape a frame-extraction job hands a vision encoder:
    * fan-out is a bounded per-row sequence (no shuffle), resize is
    * pure metadata arithmetic, and the only exchange is the final
    * per-format rollup. */
  def q67FrameManifest(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .transform(MM.withPayload)
      .withColumn("meta", MM.decodeImageMeta(col("payload")))
      .withColumn("rs", MM.resizeMeta(col("meta"), 256, 256))
      .select(col("meta.format").as("format"),
        col("rs.width").as("rs_w"), col("rs.height").as("rs_h"),
        size(MM.sampleFrameOffsets(col("payload"), 64)).as("n_frames"))
      .groupBy(col("format"))
      .agg(count(lit(1)).as("image_count"),
        sum(col("n_frames")).as("total_frames"),
        max(col("rs_w")).as("max_rs_width"),
        max(col("rs_h")).as("max_rs_height"))
  }
  val q67Sql: String =
    s"""WITH $metaCte,
      |rs AS (
      |  SELECT format, plen,
      |         least(256000 // greatest(width, 1),
      |               256000 // greatest(height, 1), 1000) AS pm,
      |         width, height
      |  FROM meta)
      |SELECT format, count(*) AS image_count,
      |       CAST(sum((plen - 1) // 64 + 1) AS BIGINT) AS total_frames,
      |       CAST(max(width * pm // 1000) AS INTEGER) AS max_rs_width,
      |       CAST(max(height * pm // 1000) AS INTEGER) AS max_rs_height
      |FROM rs GROUP BY 1""".stripMargin

  /** Cross-modal quality census (q100) — the text↔vector join the
    * paired tables exist for: every document's embedding row (doc_id =
    * vec_id, the pairing contract) tagged with the document's quality
    * bucket (the SHARED q22 cut), censused per (label, quality). This
    * is the audit a curation pipeline runs before training on an
    * embedding-clustered corpus: "is cluster 3 mostly junk text?" —
    * low-quality mass concentrated in one label means the cluster
    * (and anything SemDeDup'd inside it) inherits the junk.
    *
    * Scale: both sides hash-join on the 8-byte id — at 100 TB this is
    * the one shuffle (or free with both tables bucketed on id, the
    * layout ScaleSpec demonstrates); quality is scan-side, the census
    * re-aggregates O(labels × buckets) rows. Only integer columns
    * cross the join, so there is no float-parity surface at all. */
  def q100QualityByLabel(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("quality",
        TextOps.qualityBucket(TextOps.tokens(col("text")), col("n_chars")))
      .select(col("doc_id"), col("quality"), col("n_chars"))
      .join(Tables.embeddings(s, dir)
        .select(col("vec_id").as("doc_id"), col("label")), Seq("doc_id"))
      .groupBy(col("label"), col("quality"))
      .agg(count(lit(1)).as("doc_count"),
        expr("sum(n_chars) div count(1)").as("mean_chars"),
        min(col("doc_id")).as("min_doc_id"))
  val q100Sql: String = {
    val toks = "str_split(text, ' ')"
    val stop = "len(list_filter(str_split(text, ' '), t -> t IN " +
      "('the','and','of','to','a')))"
    s"""WITH quality AS (
       |  SELECT doc_id, n_chars,
       |    CASE WHEN len($toks) < 10 OR n_chars < 50 THEN 'too_short'
       |         WHEN ($stop * 100) // len($toks) > 30 THEN 'high_stopword'
       |         WHEN (len(list_distinct($toks)) * 100) // len($toks) < 30
       |           THEN 'repetitive'
       |         ELSE 'ok' END AS quality
       |  FROM documents)
       |SELECT e.label, q.quality, count(*) AS doc_count,
       |       CAST(sum(q.n_chars) AS BIGINT) // count(*) AS mean_chars,
       |       min(q.doc_id) AS min_doc_id
       |FROM quality q JOIN embeddings e ON q.doc_id = e.vec_id
       |GROUP BY 1, 2""".stripMargin
  }

  /** Aspect-ratio bucketing manifest (q125): the vision-training batch
    * layout step (SDXL-style) — images can only batch together when
    * their shapes match, so the corpus is bucketed by integer aspect
    * permille (width·1000 div height: tall < 900, square ≤ 1111, wide
    * above) and each (format, bucket) cell reports its image count,
    * the batch count at batch size 32 (ceil division), and the padding
    * waste in ppm — the number a training-throughput budget actually
    * wants, since every partially-filled batch pads to 32.
    *
    * Scale shape: decode + bucket are scan-side codegen'd arithmetic
    * on the metadata (the payload bytes are never touched — the
    * opaque-until-needed rule); the census is one hash-aggregate on
    * (format, bucket) with map-side combine, output O(formats ×
    * buckets). The ACTUAL batch assembly at 100 TB would repartition
    * by bucket so co-batched images land together — exactly the
    * bucketed-write layout ScaleSpec demonstrates; this manifest is
    * its row-count contract.
    */
  private val BatchSize = 32
  def q125AspectBuckets(s: SparkSession, dir: String): DataFrame = {
    Tables.documents(s, dir)
      .transform(MM.withPayload)
      .withColumn("stub", MM.decodeImageMeta(col("payload")))
      // the dims travel as REAL image bytes: the stub meta (kept as
      // the differential reference — MultimodalSpec pins the
      // roundtrip) is serialized into a real 54-byte BMP header and
      // the census reads width/height from decodeBmpMeta's BYTE parse
      // (fixed-offset LE fields), not from the stub columns. Values
      // are identical by the codec roundtrip, so the oracle is
      // unchanged; `format` stays the stub's (a BMP header carries no
      // png/jpeg tag to recover).
      .withColumn("meta", MM.decodeBmpMeta(
        MM.encodeBmpPayload(col("stub"), col("payload"))))
      .select(col("stub.format").as("format"),
        expr("meta.width * 1000 div greatest(meta.height, 1)").as("apm"))
      .withColumn("bucket",
        when(col("apm") < 900, "tall")
          .when(col("apm") <= 1111, "square")
          .otherwise(lit("wide")))
      .groupBy(col("format"), col("bucket"))
      .agg(count(lit(1)).as("images"))
      .withColumn("batches", expr(s"(images + ${BatchSize - 1}) div $BatchSize"))
      .withColumn("pad_ppm",
        expr(s"(batches * $BatchSize - images) * 1000000 div (batches * $BatchSize)"))
  }
  val q125Sql: String =
    s"""WITH $metaCte,
       |b AS (
       |  SELECT format,
       |         CASE WHEN width * 1000 // greatest(height, 1) < 900 THEN 'tall'
       |              WHEN width * 1000 // greatest(height, 1) <= 1111 THEN 'square'
       |              ELSE 'wide' END AS bucket
       |  FROM meta),
       |cen AS (SELECT format, bucket, count(*) AS images
       |        FROM b GROUP BY 1, 2)
       |SELECT format, bucket, images,
       |       (images + ${BatchSize - 1}) // $BatchSize AS batches,
       |       ((images + ${BatchSize - 1}) // $BatchSize * $BatchSize - images)
       |         * 1000000
       |         // ((images + ${BatchSize - 1}) // $BatchSize * $BatchSize)
       |         AS pad_ppm
       |FROM cen""".stripMargin

  /** ViT patch edge (pixels) for q142's token arithmetic. */
  private val PatchPx = 14

  /** Interleaved multimodal sequence packing (q142): the batch-
    * assembly step of vision-language pretraining — each document is
    * an (image, text) pair whose SEQUENCE cost is text tokens plus
    * image patch tokens (the resized image at 14-px ViT patches, the
    * Flamingo/LLaVA accounting), and pairs pack greedily into
    * 4096-token sequences per source (the q47 prefix-sum kernel —
    * shared, so text-only and multimodal packing can never drift).
    * Census per source: sequences, docs, the text/image token masses,
    * the image share in ppm (the modality-mix number a training
    * recipe pins), and mean sequence fill.
    *
    * Scale shape: decode + resize + patch arithmetic are scan-side
    * integer codegen on metadata (payload bytes never read — the
    * opaque-until-needed rule); the packing window rides ONE
    * (source)-partitioned sort (packManifest's shape) and the census
    * re-aggregates O(sources × bins) manifest rows; the mass frame
    * broadcast-joins. Fill can exceed 10⁶ ppm by at most one doc's
    * tokens per bin (greedy prefix binning — q133's bound).
    */
  def q142MultimodalPacking(s: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(s, dir)
      .transform(MM.withPayload)
      .withColumn("stub", MM.decodeImageMeta(col("payload")))
      // dims from REAL header bytes (the q125 discipline): resize
      // reads decodeBmpMeta's byte-parsed width/height, not the stub's
      .withColumn("meta", MM.decodeBmpMeta(
        MM.encodeBmpPayload(col("stub"), col("payload"))))
      .withColumn("rs", MM.resizeMeta(col("meta"), 336, 336))
      .select(col("source"), col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("text_toks"),
        expr(s"""((rs.width + ${PatchPx - 1}) div $PatchPx)
                | * ((rs.height + ${PatchPx - 1}) div $PatchPx)""".stripMargin)
          .cast("long").as("image_toks"))
      .withColumn("n_toks", col("text_toks") + col("image_toks"))
    val manifest = Text.packManifest(
      perDoc.select(col("source"), col("doc_id"), col("n_toks")))
    val seqs = manifest.groupBy(col("source"))
      .agg(count(lit(1)).as("sequences"))
    val mass = perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("docs"),
        sum(col("text_toks")).cast("long").as("text_toks"),
        sum(col("image_toks")).cast("long").as("image_toks"))
    seqs.join(broadcast(mass), "source")
      .withColumn("image_share_ppm",
        expr("image_toks * 1000000 div (text_toks + image_toks)"))
      .withColumn("mean_fill_ppm",
        expr(s"(text_toks + image_toks) * 1000000" +
          s" div (sequences * ${Text.PackBudget})"))
  }
  val q142Sql: String =
    s"""WITH $metaCte,
       |rs AS (
       |  SELECT source, doc_id, text_toks,
       |         least(336000 // greatest(width, 1),
       |               336000 // greatest(height, 1), 1000) AS pm,
       |         width, height
       |  FROM meta),
       |pd AS (
       |  SELECT source, doc_id, text_toks,
       |         ((width * pm // 1000 + ${PatchPx - 1}) // $PatchPx)
       |           * ((height * pm // 1000 + ${PatchPx - 1}) // $PatchPx)
       |           AS image_toks
       |  FROM rs),
       |binned AS (
       |  SELECT source, text_toks, image_toks,
       |         CAST(coalesce(sum(text_toks + image_toks) OVER (
       |             PARTITION BY source ORDER BY doc_id
       |             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |           // ${Text.PackBudget} AS BIGINT) AS bin_id
       |  FROM pd),
       |seqs AS (SELECT source, count(DISTINCT bin_id) AS sequences
       |         FROM binned GROUP BY 1),
       |mass AS (SELECT source, count(*) AS docs,
       |                CAST(sum(text_toks) AS BIGINT) AS text_toks,
       |                CAST(sum(image_toks) AS BIGINT) AS image_toks
       |         FROM binned GROUP BY 1)
       |SELECT source, sequences, docs, text_toks, image_toks,
       |       image_toks * 1000000 // (text_toks + image_toks)
       |         AS image_share_ppm,
       |       (text_toks + image_toks) * 1000000
       |         // (sequences * ${Text.PackBudget}) AS mean_fill_ppm
       |FROM seqs JOIN mass USING (source)""".stripMargin
}
