package graft.queries

import graft.Tables
import graft.ops.{Multimodal => MM}
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
  val q32Sql: String =
    """WITH meta AS (
      |  SELECT CAST('0x' || substr(md5(text), 1, 4) AS INTEGER) % 1920 AS width,
      |         CAST('0x' || substr(md5(text), 5, 4) AS INTEGER) % 1080 AS height,
      |         CAST('0x' || substr(md5(text), 9, 2) AS INTEGER) % 3 + 1 AS channels,
      |         CASE WHEN CAST('0x' || substr(md5(text), 11, 2) AS INTEGER) % 2 = 0
      |              THEN 'png' ELSE 'jpeg' END AS format
      |  FROM documents)
      |SELECT format, count(*) AS image_count,
      |       round(avg(width), 2) AS avg_width,
      |       round(avg(height), 2) AS avg_height,
      |       CAST(sum(channels) AS BIGINT) AS total_channels
      |FROM meta GROUP BY 1""".stripMargin
}
