package graft

/** Dev tool: warmed A/B timing of registered queries in ONE JVM —
  * `runMain graft.AbBench <sfDir> <reps> <name> [name...]` runs each
  * query once untimed (codegen + IO cache warm), then `reps`
  * alternating timed passes, and prints per-query median seconds.
  * For plan-shape comparisons (e.g. q102 explode vs q103 fused) where
  * cold-JVM Scratch times are all startup noise.
  *
  * REGRESSION LEDGER (verdict-r14 "Next round" #5): single-pass
  * wall-clock proved host-hostage even on quiet hosts (same-binary
  * sweeps spread 1.4×; the eviction rows 3×), so the cross-round
  * regression signal is the WARMED MEDIAN, not the sweep. When
  * `GRAFT_MEDIANS_OUT` names a file, every run MERGES its per-query
  * medians (with min/max/reps and the host load stamps) into that
  * JSON — the per-round `medians_r{N}.json` artifact next to BENCH.
  * The rule: compare medians across rounds, flag a query only above
  * 1.35× with both rounds' load stamps attached; a sweep number
  * disagreeing with a flat median is host drift, not code drift. */
object AbBench {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val names = args.drop(2).toSeq
    val loadStart = loadAvg
    val spark = LocalSession.build(defaultCpus = "32")
    spark.sparkContext.setLogLevel("ERROR")
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(run) // warmup pass, untimed
    val chrono = (1 to reps).flatMap(_ => names.map(n => n -> run(n)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val times = chrono.view.mapValues(_.sorted).toMap
    names.foreach { n =>
      val ts = times(n)
      // runs are CHRONOLOGICAL (pass order), not sorted — a tail that
      // grows with pass index is JVM/state accumulation, not host noise
      println(f"[ab] $n%-28s median ${ts(ts.size / 2)}%.3fs  " +
        f"min ${ts.head}%.3fs  runs ${chrono(n).map(t => f"$t%.2f").mkString(",")}")
    }
    sys.env.get("GRAFT_MEDIANS_OUT").foreach { out =>
      mergeMedians(out, sfDir, reps, loadStart, loadAvg,
        names.map(n => n -> times(n)))
    }
    spark.stop()
  }

  private def loadAvg: Double =
    try java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .getSystemLoadAverage
    catch { case _: Throwable => -1.0 }

  /** Merge this run's medians into the artifact (last write wins per
    * query name — re-running a family refreshes its rows). */
  private def mergeMedians(path: String, sfDir: String, reps: Int,
      loadStart: Double, loadEnd: Double,
      entries: Seq[(String, Seq[Double])]): Unit = {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val rootNode: com.fasterxml.jackson.databind.node.ObjectNode = {
      val f = new java.io.File(path)
      if (f.exists())
        mapper.readTree(f)
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else mapper.createObjectNode()
    }
    val qs =
      if (rootNode.has("queries"))
        rootNode.get("queries")
          .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      else rootNode.putObject("queries")
    def r3(v: Double) = math.rint(v * 1000) / 1000
    entries.foreach { case (n, ts) =>
      val e = qs.putObject(n)
      e.put("median", r3(ts(ts.size / 2)))
      e.put("min", r3(ts.head))
      e.put("max", r3(ts.last))
      e.put("reps", reps)
      e.put("sf", sfDir)
      e.put("load_avg_start", r3(loadStart))
      e.put("load_avg_end", r3(loadEnd))
    }
    rootNode.put("rule",
      "compare medians across rounds; flag > 1.35x with load stamps")
    val w = new java.io.PrintWriter(path)
    try w.println(mapper.writerWithDefaultPrettyPrinter()
      .writeValueAsString(rootNode))
    finally w.close()
  }
}
