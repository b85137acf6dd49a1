package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (north-star extension): image / audio /
  * video payloads travel as opaque `binary` columns next to typed
  * metadata, the lakehouse-standard layout for multimodal pretraining
  * data. The Spark-side plumbing — schema, batching, partition sizing,
  * decode signature — is real; the codec itself is STUBBED with a
  * deterministic md5-derived fake (this container has no image/audio
  * libraries), clearly marked below. Swapping in a real decoder means
  * replacing ONE function body; every plan shape stays identical.
  *
  * Scale notes: payloads stay opaque until the last possible stage
  * (no decode before filters/dedup); decode itself is a per-row
  * map — embarrassingly parallel, no shuffle; metadata extraction is
  * expressed in codegen'd functions so scans stay columnar. For
  * Python-side decoding Spark's `mapInPandas`/`mapInArrow` is the
  * equivalent vectorized hook; in Scala the per-partition batch hook
  * is `mapPartitions` over the payload iterator.
  */
object Multimodal {

  /** Attach a synthetic payload column: the documents' text bytes
    * standing in for an image blob (deterministic; at ingest time this
    * column would come from the object store). */
  def withPayload(docs: DataFrame): DataFrame =
    docs.withColumn("payload", col("text").cast("binary"))

  /** STUB DECODER — deterministic fake. A real implementation would
    * parse the image header (e.g. PNG IHDR / JPEG SOF0) from the first
    * bytes of the payload; the md5-derived values below stand in so
    * the schema, distribution and aggregation shapes are exercised
    * end-to-end and oracle-checkable. Width/height/channels/format are
    * pure functions of the payload bytes.
    */
  def decodeImageMeta(payload: Column): Column = {
    val h = md5(payload)
    struct(
      (conv(substring(h, 1, 4), 16, 10).cast("int") % 1920).as("width"),
      (conv(substring(h, 5, 4), 16, 10).cast("int") % 1080).as("height"),
      (conv(substring(h, 9, 2), 16, 10).cast("int") % 3 + 1).as("channels"),
      when(conv(substring(h, 11, 2), 16, 10).cast("int") % 2 === 0, "png")
        .otherwise(lit("jpeg")).as("format"))
  }

  // ------------------------------------------ real BMP header codec

  /** 4-byte little-endian integer serialized scan-side (codegen'd
    * string/binary functions only — no UDF, no library). */
  private def le4(v: Column): Column = unhex(format_string("%02x%02x%02x%02x",
    v.bitwiseAND(lit(255)),
    shiftright(v, 8).bitwiseAND(lit(255)),
    shiftright(v, 16).bitwiseAND(lit(255)),
    shiftright(v, 24).bitwiseAND(lit(255))))

  /** 2-byte little-endian integer, same discipline. */
  private def le2(v: Column): Column = unhex(format_string("%02x%02x",
    v.bitwiseAND(lit(255)), shiftright(v, 8).bitwiseAND(lit(255))))

  /** 4-byte little-endian integer READ from a binary column at 1-based
    * byte offset `off` — substring the 4 bytes, hex them, reorder the
    * byte pairs big-endian, conv back. All codegen'd. */
  private def leInt4(payload: Column, off: Int): Column = {
    val h = hex(substring(payload, off, 4))
    conv(concat(substring(h, 7, 2), substring(h, 5, 2),
      substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }

  /** 2-byte little-endian read, same discipline. */
  private def leInt2(payload: Column, off: Int): Column = {
    val h = hex(substring(payload, off, 2))
    conv(concat(substring(h, 3, 2), substring(h, 1, 2)), 16, 10).cast("int")
  }

  /** Serialize decoded metadata into a REAL 54-byte BMP header
    * (BITMAPFILEHEADER + BITMAPINFOHEADER, the fixed-offset layout
    * every BMP reader parses: 'BM' magic, pixel-data offset 54, width
    * LE at byte 18, height at 22, planes 1, bpp = channels·8 at 28)
    * followed by `body` as the pixel payload (not transcoded — the
    * harness has no real image files, so this encoder is what stands
    * in for them; [[decodeBmpMeta]] is the REAL parser under test).
    * Every field is scan-side codegen'd binary arithmetic. */
  def encodeBmpPayload(meta: Column, body: Column): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    val bpp = meta.getField("channels") * lit(8)
    concat(
      unhex(lit("424D")),                 //  0: 'BM'
      le4(length(body) + lit(54)),        //  2: file size
      le4(lit(0)),                        //  6: reserved
      le4(lit(54)),                       // 10: pixel data offset
      le4(lit(40)),                       // 14: info header size
      le4(w),                             // 18: width
      le4(h),                             // 22: height
      le2(lit(1)),                        // 26: planes
      le2(bpp),                           // 28: bits per pixel
      le4(lit(0)),                        // 30: compression (BI_RGB)
      le4(w * h * meta.getField("channels")), // 34: image size
      le4(lit(2835)), le4(lit(2835)),     // 38/42: 72 dpi in px/m
      le4(lit(0)), le4(lit(0)),           // 46/50: palette counts
      body)
  }

  /** REAL header parse — the fixed-offset integer fields of a BMP,
    * read from the payload BYTES (magic check, 4-byte LE dims at
    * offsets 18/22, 2-byte LE bpp at 28 → channels): NULL on a payload
    * that is not a BMP (wrong magic or shorter than its 54-byte
    * header), which is the decode contract a corrupt blob hits instead
    * of garbage dims. Entirely codegen'd scan-side expressions (hex /
    * substring / conv) — the decode cost is a per-row map, no shuffle,
    * exactly where a real libjpeg/libpng header probe would sit. */
  def decodeBmpMeta(payload: Column): Column =
    when(length(payload) >= 54 && hex(substring(payload, 1, 2)) === "424D",
      struct(
        leInt4(payload, 19).as("width"),
        leInt4(payload, 23).as("height"),
        (leInt2(payload, 29) / 8).cast("int").as("channels"),
        lit("bmp").as("format")))

  // ------------------------------------------ real PPM header codec

  /** Serialize decoded metadata into a REAL binary-PPM/PGM header
    * ("P6\n<w> <h>\n255\n" — the ASCII-header netpbm layout every PPM
    * reader parses; P5 for 1-channel graymaps, P6 otherwise with the
    * 3-channel contract the format imposes) followed by `body` as the
    * pixel payload. Scan-side codegen'd string functions only. */
  def encodePpmPayload(meta: Column, body: Column): Column =
    concat(
      format_string("%s\n%d %d\n255\n",
        when(meta.getField("channels") === 1, "P5").otherwise(lit("P6")),
        meta.getField("width"), meta.getField("height")).cast("binary"),
      body)

  /** The fixed byte window [[decodePpmMeta]] inspects: magic (2) +
    * three single-byte separators + "255" + trailing separator = 9
    * framing bytes, leaving [[PpmMaxDimChars]] = 15 for the two
    * dimension fields combined (e.g. 7+8 digits ≈ a 10-megapixel-per-
    * side bound, far past any real raster). A structurally valid
    * header WIDER than this window decodes to NULL-as-malformed by
    * contract — the bound is part of the decode contract, not an
    * accident of the parse. */
  val PpmMaxDimChars: Int = 15
  val PpmHeaderWindow: Int = 9 + PpmMaxDimChars

  /** REAL netpbm header parse from the payload BYTES: magic check
    * (P5/P6), whitespace-separated ASCII dims, maxval 255 — NULL on
    * anything else (wrong magic, truncated or malformed header), the
    * same corrupt-blob contract as [[decodeBmpMeta]]. The header
    * prefix is byte-substring'd BEFORE the string cast, so arbitrary
    * pixel bytes after it can never confuse the anchored parse.
    * Headers longer than [[PpmHeaderWindow]] bytes (width+height
    * fields past [[PpmMaxDimChars]] combined digits) are REJECTED as
    * malformed — a documented bound, not a silent truncation.
    * Entirely codegen'd (substring / regexp_extract / cast). */
  def decodePpmMeta(payload: Column): Column = {
    val hdr = substring(payload, 1, PpmHeaderWindow).cast("string")
    val magic = substring(payload, 1, 2).cast("string")
    val re = "^P[56]\\s+(\\d+)\\s+(\\d+)\\s+255\\s"
    // a failed regexp yields "" — CASE keeps the ANSI int cast off the
    // no-match branch (try_cast semantics without leaving codegen)
    def num(group: Int): Column = {
      val g = regexp_extract(hdr, re, group)
      when(g =!= "", g.cast("int"))
    }
    val w = num(1)
    val h = num(2)
    when(magic.isin("P5", "P6") && w.isNotNull && h.isNotNull,
      struct(w.as("width"), h.as("height"),
        when(magic === "P5", 1).otherwise(lit(3)).as("channels"),
        when(magic === "P5", "pgm").otherwise(lit("ppm")).as("format")))
  }

  /** Frame sampling stub for video-like payloads: pick every nth
    * "frame offset" — the plumbing is a lateral explode over a
    * sequence bounded by payload length, exactly how frame extraction
    * fans out one row per sampled frame. */
  def sampleFrameOffsets(payload: Column, everyNBytes: Int): Column =
    when(length(payload) > 0,
      sequence(lit(0), length(payload) - 1, lit(everyNBytes)))
      .otherwise(array().cast("array<int>")) // empty payload → zero frames

  /** Resize stub: rewrites the decoded metadata to a target box
    * preserving aspect ratio (integer math only — oracle-safe). A real
    * implementation would transcode payload bytes; the metadata
    * contract (what downstream sees) is exactly this. */
  def resizeMeta(meta: Column, maxW: Int, maxH: Int): Column = {
    val w = meta.getField("width")
    val h = meta.getField("height")
    // scale = min(maxW/w, maxH/h) in integer permille to stay exact
    val scalePm = least(lit(maxW * 1000) / greatest(w, lit(1)),
      lit(maxH * 1000) / greatest(h, lit(1)),
      lit(1000)).cast("int")
    struct(
      (w * scalePm / 1000).cast("int").as("width"),
      (h * scalePm / 1000).cast("int").as("height"),
      meta.getField("channels").as("channels"),
      meta.getField("format").as("format"))
  }

  /** The per-partition imperative hook (Scala's equivalent of
    * mapInPandas/mapInArrow batches): decode payloads partition-wise
    * with an explicit iterator — the escape hatch for codecs that hold
    * per-thread native state (decoder contexts, ONNX sessions). The
    * decoder context is created ONCE per partition, not per row.
    * Deterministic stub decoder; swap `decodeOne` for a real codec.
    */
  def decodePartitionwise(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val outSchema = StructType(docs.schema.fields :+
      StructField("decoded_len", IntegerType, nullable = false))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    docs.mapPartitions { rows =>
      // per-partition "decoder context" (stub: a reusable digest)
      val ctx = java.security.MessageDigest.getInstance("MD5")
      def decodeOne(payload: Array[Byte]): Int = {
        ctx.reset()
        ctx.digest(payload).map(_ & 0xff).sum // stand-in for decode work
      }
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row.fromSeq(r.toSeq :+ decodeOne(payload))
      }
    }(enc)
  }

  /** Feature-extraction stub: fixed-size feature vector from payload
    * bytes (real impl: a vision encoder via mapInArrow batches). Eight
    * md5-derived doubles in [0,1). */
  def extractFeatures(payload: Column): Column = {
    val h = md5(payload)
    transform(sequence(lit(0), lit(7)), i =>
      conv(substring(h, i * 4 + 1, lit(4)), 16, 10).cast("double") / 65536d)
  }
}
