package graft

import graft.streaming.Streams
import org.apache.spark.sql.functions._

/** Throwaway probe (not part of the driver contract): the compaction
  * payoff curve. Lands a many-batch KMV partials log in the monitor's
  * exact layout, then measures live-snapshot latency against the
  * un-folded log, the fold itself, and the snapshot against the
  * folded log — the number that says when a long-running monitor's
  * maintenance cycle pays for itself. */
object CompactProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val batches = args.headOption.map(_.toInt).getOrElse(48)
    val spark = LocalSession.build(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    def t(label: String, reps: Int = 3)(f: => Unit): Double = {
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"[compactprobe] $label%-26s best ${ts.min}%.2fs runs ${ts.map(x => f"$x%.2f").mkString(",")}")
      ts.min
    }
    val work = Streams.scratchDir("graft_compactprobe")
    val docs = Tables.documents(spark, sfDir)
      .select(col("source"), col("doc_id"), col("text"))
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    (0 until batches).foreach { i =>
      Streams.kmvMerge()(graft.queries.Stats
          .chunkHashesOf(docs.filter(col("doc_id") % batches === i)))
        .withColumn("batch_id", lit(i.toLong))
        .write.mode("append").partitionBy("batch_id").parquet(s"$work/kmv")
    }
    def snap(): Unit = Streams.kmvSnapshot(spark, s"$work/kmv")
      .write.format("noop").mode("overwrite").save()
    snap() // warm codegen
    t(s"snapshot over $batches parts")(snap())
    val tFold = t("fold (1 rep)", reps = 1) {
      Streams.compactMinMergePartials(spark, s"$work/kmv", Streams.kmvMerge())
    }
    t("snapshot over folded log")(snap())
    println(f"[compactprobe] fold cost $tFold%.2fs amortizes over subsequent snapshots")
    spark.stop()
  }
}
