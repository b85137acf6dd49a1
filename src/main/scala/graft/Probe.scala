package graft

import org.apache.spark.sql.SparkSession

/** Throwaway perf probe (not part of the driver contract). Times the
  * named queries (args) at SPARK_GRAFT_SF_DIR with the Bench JVM
  * config — warmup pass then best-of-2 per query, noop sink. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build(defaultCpus = "32")
    val names = if (args.nonEmpty) args.toSeq else Seq("q37_sketches")
    def exec(name: String, dir: String): Unit =
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    names.foreach { n =>
      exec(n, "/root/testdata/sf0.001") // warmup: classes + codegen
      val ts = (1 to 2).map { _ =>
        val t0 = System.nanoTime(); exec(n, sfDir)
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $n%-28s best=${ts.min}%.2fs runs=${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
