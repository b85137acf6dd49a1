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
