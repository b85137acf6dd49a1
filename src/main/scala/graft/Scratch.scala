package graft

import org.apache.spark.sql.SparkSession

/** Throwaway isolation runner:
  * `runMain graft.Scratch <queryName> [sfDir] [repeats]`.
  * Prints the full stack trace on failure (Bench only logs getMessage).
  * `repeats` > 1 re-runs in the same JVM — separates steady-state
  * engine time from cold-start codegen/classloading like Bench's
  * best-of-2 does. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val repeats = if (args.length > 2) args(2).toInt else 1
    val spark = LocalSession.build(defaultCpus = "32")
    val fn = SparkEntry.queries(name)
    try {
      (1 to repeats).foreach { i =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        println(f"[scratch] $name OK ${(System.nanoTime() - t0) / 1e9}%.2fs" +
          (if (repeats > 1) s" (run $i)" else ""))
      }
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
