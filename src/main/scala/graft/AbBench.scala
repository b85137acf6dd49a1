package graft

/** Dev tool: warmed A/B timing of registered queries in ONE JVM —
  * `runMain graft.AbBench <sfDir> <reps> <name> [name...]` runs each
  * query once untimed (codegen + IO cache warm), then `reps`
  * alternating timed passes, and prints per-query median seconds.
  * For plan-shape comparisons (e.g. q102 explode vs q103 fused) where
  * cold-JVM Scratch times are all startup noise. */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val spark = LocalSession.build(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warmup pass, untimed
    val times = (1 to reps).flatMap(_ => names.map(n => n -> run(n)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    names.foreach { n =>
      val ts = times(n)
      println(f"[ab] $n%-28s median ${ts(ts.size / 2)}%.3fs  " +
        f"min ${ts.head}%.3fs  runs ${ts.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
