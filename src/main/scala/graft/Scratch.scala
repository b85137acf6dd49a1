package graft

import org.apache.spark.sql.SparkSession

/** Throwaway isolation runner: `runMain graft.Scratch <queryName> [sfDir]`.
  * Prints the full stack trace on failure (Bench only logs getMessage).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = SparkEntry.queries(name)
    try {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[scratch] $name OK ${(System.nanoTime() - t0) / 1e9}%.2fs")
    } catch {
      case e: Throwable =>
        println(s"[scratch] $name FAILED")
        e.printStackTrace()
        spark.stop()
        sys.exit(1) // scripted callers must see the failure
    }
    spark.stop()
  }
}
