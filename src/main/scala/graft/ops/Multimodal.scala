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
    sequence(lit(0), greatest(length(payload) - 1, lit(0)), lit(everyNBytes))

  /** Feature-extraction stub: fixed-size feature vector from payload
    * bytes (real impl: a vision encoder via mapInArrow batches). Eight
    * md5-derived doubles in [0,1). */
  def extractFeatures(payload: Column): Column = {
    val h = md5(payload)
    transform(sequence(lit(0), lit(7)), i =>
      conv(substring(h, i * 4 + 1, lit(4)), 16, 10).cast("double") / 65536d)
  }
}
