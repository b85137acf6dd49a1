package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  lazy val docs = Seq((1L, "hello world"), (2L, "another doc"))
    .toDF("doc_id", "text").transform(Multimodal.withPayload)

  test("payload is the raw utf-8 bytes; decode stub is deterministic per payload") {
    val m = docs.withColumn("meta", Multimodal.decodeImageMeta(col("payload")))
      .select(col("doc_id"), col("meta.width"), col("meta.height"),
        col("meta.channels"), col("meta.format"))
    val rows1 = rowsOf(m); val rows2 = rowsOf(m)
    assert(rows1 === rows2 && rows1.size === 2)
    val widths = m.collect().map(_.getInt(1))
    assert(widths.forall(w => w >= 0 && w < 1920))
  }

  test("resize preserves aspect ratio and never upscales") {
    val m = docs.withColumn("meta", Multimodal.decodeImageMeta(col("payload")))
      .withColumn("small", Multimodal.resizeMeta(col("meta"), 64, 64))
      .select(col("meta.width").as("w"), col("small.width").as("sw"),
        col("small.height").as("sh"))
    m.collect().foreach { r =>
      assert(r.getInt(1) <= 64 && r.getInt(2) <= 64)
      assert(r.getInt(1) <= r.getInt(0))
    }
  }

  test("frame sampling fans out bounded offsets") {
    val f = docs.select(col("doc_id"),
      explode(Multimodal.sampleFrameOffsets(col("payload"), 4)).as("off"))
    val offs = f.filter(col("doc_id") === 1).collect().map(_.getInt(1))
    assert(offs.head === 0 && offs.forall(_ < "hello world".length))
  }

  test("frame sampling: empty payload yields zero frames, not one at offset 0") {
    val empty = Seq((1L, "")).toDF("doc_id", "text").transform(Multimodal.withPayload)
    val n = empty.select(explode(
      Multimodal.sampleFrameOffsets(col("payload"), 4)).as("off")).count()
    assert(n === 0)
  }

  test("partition-wise decode: context per partition, one output row per input") {
    val out = Multimodal.decodePartitionwise(docs)
    assert(out.count() === 2)
    assert(out.columns.contains("decoded_len"))
    // deterministic across runs
    assert(rowsOf(out.select("doc_id", "decoded_len")) ===
      rowsOf(Multimodal.decodePartitionwise(docs).select("doc_id", "decoded_len")))
  }

  test("feature vector: 8 dims in [0,1)") {
    val f = docs.select(Multimodal.extractFeatures(col("payload")).as("f"))
      .collect().map(_.getSeq[Double](0))
    assert(f.forall(v => v.size === 8 && v.forall(x => x >= 0 && x < 1)))
  }

  test("BMP codec roundtrip: byte-parsed dims equal the encoded meta, corpus-wide") {
    // the q125/q142 path: stub meta -> real 54-byte BMP header ->
    // decodeBmpMeta's fixed-offset byte parse; dims and channels must
    // survive the trip exactly (this is what keeps the oracles
    // unchanged while the dims come from bytes)
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .transform(Multimodal.withPayload)
      .withColumn("stub", Multimodal.decodeImageMeta(col("payload")))
      .withColumn("hdr", Multimodal.decodeBmpMeta(
        Multimodal.encodeBmpPayload(col("stub"), col("payload"))))
    assert(d.filter(col("hdr").isNull).count() === 0,
      "every encoded payload must parse as a valid BMP")
    val drift = d.filter(
      col("hdr.width") =!= col("stub.width") ||
      col("hdr.height") =!= col("stub.height") ||
      col("hdr.channels") =!= col("stub.channels")).count()
    assert(drift === 0, s"$drift docs drifted through the BMP roundtrip")
  }

  test("PPM codec roundtrip: ASCII-parsed dims equal the encoded meta; P5/P6 by channels") {
    val d = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .transform(Multimodal.withPayload)
      .withColumn("stub", Multimodal.decodeImageMeta(col("payload")))
      .withColumn("hdr", Multimodal.decodePpmMeta(
        Multimodal.encodePpmPayload(col("stub"), col("payload"))))
    assert(d.filter(col("hdr").isNull).count() === 0,
      "every encoded payload must parse as a valid netpbm")
    val drift = d.filter(
      col("hdr.width") =!= col("stub.width") ||
      col("hdr.height") =!= col("stub.height")).count()
    assert(drift === 0, s"$drift docs drifted through the PPM roundtrip")
    // the format's own channel contract: 1-channel stubs take P5/1,
    // everything else P6/3
    assert(d.filter(col("stub.channels") === 1 &&
      (col("hdr.format") =!= "pgm" || col("hdr.channels") =!= 1))
      .count() === 0)
    assert(d.filter(col("stub.channels") =!= 1 &&
      (col("hdr.format") =!= "ppm" || col("hdr.channels") =!= 3))
      .count() === 0)
  }

  test("PPM parse: a golden header yields literal dims; corrupt/truncated decode NULL") {
    val m = Seq("P6\n640 480\n255\nXYZ").toDF("s")
      .select(Multimodal.decodePpmMeta(col("s").cast("binary")).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"),
        col("m.format"))
    assert(rowsOf(m) === Seq(Seq("640", "480", "3", "ppm")))
    val bad = Seq(
      "P4\n640 480\n255\n",   // wrong magic (bitmap, not byte map)
      "P6\n640 480\n127\n",   // wrong maxval
      "P6\n640",              // truncated header
      "BM whatever").toDF("s")
      .select(Multimodal.decodePpmMeta(col("s").cast("binary")).as("m"))
    assert(bad.filter(col("m").isNotNull).count() === 0,
      "corrupt netpbm headers must decode to NULL, never garbage dims")
  }

  test("BMP parse: a hand-built golden header yields its literal dims") {
    // 640x480, 24 bpp, hand-assembled LE fields — the parser against
    // bytes it did not encode
    val hdr = "424D" + "36000000" + "00000000" + "36000000" +
      "28000000" + "80020000" + "E0010000" + "0100" + "1800" +
      "00000000" + "00000000" + "00000000" + "00000000" +
      "00000000" + "00000000"
    val m = Seq(hdr).toDF("h")
      .select(Multimodal.decodeBmpMeta(unhex(col("h"))).as("m"))
      .select(col("m.width"), col("m.height"), col("m.channels"),
        col("m.format"))
    assert(rowsOf(m) === Seq(Seq("640", "480", "3", "bmp")))
  }

  test("BMP parse contract: corrupt magic and truncated headers decode to NULL") {
    val good = docs
      .withColumn("stub", Multimodal.decodeImageMeta(col("payload")))
      .select(Multimodal.encodeBmpPayload(col("stub"), col("payload"))
        .as("bmp"))
    // flip the magic ('BM' -> 'XM') and truncate below the 54-byte header
    val cases = good
      .withColumn("corrupt", concat(unhex(lit("584D")),
        substring(col("bmp"), 3, 1 << 28)))
      .withColumn("short", substring(col("bmp"), 1, 53))
    assert(cases.filter(Multimodal.decodeBmpMeta(col("corrupt")).isNotNull)
      .count() === 0, "wrong magic must decode to NULL, not garbage dims")
    assert(cases.filter(Multimodal.decodeBmpMeta(col("short")).isNotNull)
      .count() === 0, "a truncated header must decode to NULL")
    assert(cases.filter(Multimodal.decodeBmpMeta(col("bmp")).isNull)
      .count() === 0, "the uncorrupted payloads must still parse")
  }
}
