package graft.queries

import graft.Tables
import graft.functions.ZOrderFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout operators — the write-path half of scan efficiency at
  * 100 TB: how rows are arranged in files decides what min/max file
  * statistics can prune later. Nothing here shuffles more than once;
  * the curve position is computed scan-side in codegen.
  */
object Layout {

  /** File-id granularity for the q72 census: the 32-bit curve space
    * split into ≤1024 equal z-ranges (2^22 positions each) — a stand-in
    * for "one parquet file per range" that keeps the oracle exact. */
  val ZFileShift = 4194304L // 2^22

  def dayAndCust(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir).select(
      datediff(to_date(col("o_orderdate")), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      col("o_custkey"))

  /** Curve position + census grain over any (day, o_custkey) frame —
    * shared by q72 and the q211 ingest-clustering twin. */
  def curveFrame(df: DataFrame): DataFrame =
    df.select(col("day"), col("o_custkey"),
        ZOrderFunctions.zorder2(col("day") % 65536, col("o_custkey") % 65536)
          .as("z"))
      .withColumn("zfile", expr(s"z div $ZFileShift"))

  /** The per-curve-range zone-map census both spellings report. */
  def zoneCensus(curved: DataFrame): DataFrame =
    curved.groupBy(col("zfile"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("day")).as("min_day"), max(col("day")).as("max_day"),
        min(col("o_custkey")).as("min_cust"),
        max(col("o_custkey")).as("max_cust"))

  /** Z-order layout census (q72): Morton-interleave (order day,
    * customer) and report, per curve-range "file", the row count and
    * the min/max of BOTH dimensions. The point the numbers make: range-
    * partitioning by the curve keeps both per-file ranges narrow at
    * once (a date-sorted layout would leave customer min/max spanning
    * the whole domain in every file), so filters on either dimension
    * prune files. The write path for a real table is
    * [[zorderWrite]] — this census is its oracle-checkable shadow.
    */
  def q72ZorderCensus(s: SparkSession, dir: String): DataFrame =
    zoneCensus(curveFrame(dayAndCust(s, dir)))

  val q72Sql: String = {
    val day = "CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT)"
    val z = ZOrderFunctions.zorderSql(s"($day % 65536)", "(o_custkey % 65536)")
    s"""SELECT $z // $ZFileShift AS zfile,
       |       count(*) AS n_rows,
       |       min($day) AS min_day, max($day) AS max_day,
       |       min(o_custkey) AS min_cust, max(o_custkey) AS max_cust
       |FROM orders GROUP BY 1""".stripMargin
  }

  /** The actual layout write: range-partition by curve position (one
    * Exchange — the sort Spark would do anyway to write sorted files)
    * and sort within partitions so parquet row groups inherit the
    * locality. `targetFiles` maps to cluster parallelism at scale. */
  def zorderWrite(df: DataFrame, x: String, y: String,
                  targetFiles: Int): DataFrame = {
    val z = df.withColumn("z",
      ZOrderFunctions.zorder2(col(x).cast("long") % 65536,
        col(y).cast("long") % 65536))
    z.repartitionByRange(targetFiles, col("z")).sortWithinPartitions(col("z"))
  }

  // ------------------------------------------------- bucketed tables

  /** Bucketed table write — the co-located-join layout: rows are
    * hash-partitioned into `buckets` files by `bucketCol` AT WRITE
    * TIME (with an optional in-bucket sort), so every later equi-join
    * or aggregation on that column reads pre-partitioned data and
    * plans ZERO Exchange on the bucketed side. This is how a 100 TB
    * fact table joins a 100 TB fact table without either shuffling:
    * pay the partitioning once at ingest, reuse it for every
    * downstream join/agg (BucketedJoinSpec proves the exchange-free
    * plan and the counterfactual). Bucket count is fixed at write
    * time — size it to target-file count at scale (like
    * [[zorderWrite]]'s targetFiles); both sides of a co-located join
    * must agree on it.
    */
  def bucketedWrite(df: DataFrame, table: String, bucketCol: String,
                    buckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(buckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  // ------------------------------------------------- corpus shuffle

  /** Shard fan-out for the q87 manifest. At cluster scale this is the
    * training job's file parallelism (thousands); 16 keeps every shard
    * populated at test SFs. */
  val ShuffleShards = 16L

  /** Modulus for the order fingerprint: keys are reduced mod this
    * before the Σ key·rank fold so the sum stays far from BIGINT
    * overflow at any test SF (1e6 · rank · rows). */
  val ShuffleFpMod = 1000003L

  /** Row-owned shuffle key: first 15 md5 hex digits of "shuf:"+doc_id
    * as a long — the q48/q75 keyed-hash convention. Changing the tag
    * string reshuffles the corpus; nothing else does. */
  def shuffleKey(docId: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit("shuf:"), docId.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** Deterministic corpus shuffle manifest (q87) — the global
    * training-order shuffle every pretraining run needs, made
    * reproducible: each doc owns a seeded hash key, shard = key mod
    * [[ShuffleShards]], within-shard order = (key, doc_id). The
    * manifest proves BOTH halves of the layout per shard: the
    * assignment (doc/char counts, key range) and the ORDER — an
    * order-sensitive Σ (key mod [[ShuffleFpMod]])·rank fingerprint
    * that moves if any two rows swap. The actual write is
    * [[corpusShuffleWrite]]; this census is its oracle-checkable
    * shadow (the q72/zorderWrite duality).
    *
    * Scale shape: ONE hash exchange on the shard id; the row_number
    * window and the final shard agg both reuse that partitioning
    * (local sort, no second exchange — plan-asserted in spec). No
    * driver state, no RNG: a replayed job or a different executor
    * count lays out byte-identical shards.
    */
  def q87CorpusShuffle(s: SparkSession, dir: String): DataFrame = {
    val keyed = Tables.documents(s, dir)
      .select(col("doc_id"), col("n_chars"))
      .withColumn("k", shuffleKey(col("doc_id")))
      .withColumn("shard", col("k") % ShuffleShards)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col("k"), col("doc_id"))
    keyed
      .withColumn("rn", row_number().over(w).cast("long"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("shard_chars"),
        min(col("k")).as("min_key"), max(col("k")).as("max_key"),
        sum((col("k") % ShuffleFpMod) * col("rn")).as("order_fp"))
  }

  val q87Sql: String =
    s"""WITH keyed AS (
       |  SELECT doc_id, n_chars,
       |         CAST('0x' || substr(md5('shuf:' || CAST(doc_id AS VARCHAR)), 1, 15)
       |              AS BIGINT) AS k
       |  FROM documents),
       |sharded AS (
       |  SELECT n_chars, k, k % $ShuffleShards AS shard,
       |         row_number() OVER (PARTITION BY k % $ShuffleShards
       |                            ORDER BY k, doc_id) AS rn
       |  FROM keyed)
       |SELECT shard, count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS shard_chars,
       |       min(k) AS min_key, max(k) AS max_key,
       |       CAST(sum((k % $ShuffleFpMod) * rn) AS BIGINT) AS order_fp
       |FROM sharded GROUP BY 1""".stripMargin

  /** The actual shuffle write: hash-partition on the shard id and
    * local-sort by (shard, key, id) — ONE exchange, and the resulting
    * files are the training order. A shard never splits across
    * partitions (the partitioner is a pure function of the shard id),
    * but two shards may share a partition (hash collision), which is
    * why the local sort leads with the shard id: each shard is a
    * contiguous, ordered run, so a downstream `partitionBy(__shard)`
    * write emits one sorted file per shard. Rerunning on any cluster
    * shape yields byte-identical shard contents and order, because
    * both the assignment and the sort key live with the row. */
  def corpusShuffleWrite(df: DataFrame, idCol: String, shards: Int): DataFrame = {
    val keyed = df.withColumn("__sk", shuffleKey(col(idCol)))
      .withColumn("__shard", col("__sk") % shards.toLong)
    keyed.repartition(shards, col("__shard"))
      .sortWithinPartitions(col("__shard"), col("__sk"), col(idCol))
  }
}
