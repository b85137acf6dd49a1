package graft

import org.apache.spark.sql.SparkSession

/** The ONE local-mode SparkSession factory for every runnable main in
  * this repo (Bench, Verify, the stress harnesses, the dev probes).
  * Nine hand-copied builder blocks drifted before this existed — the
  * round-6 q17 outage was exactly this class of drift (a config
  * present in some copies, absent where it mattered). Parallelism
  * comes from SPARK_GRAFT_CPUS (driver contract), shuffle partitions
  * match it (local mode: one core per partition is the right size,
  * not the 200 default), and the parquet/ICU/timezone settings every
  * query path assumes are applied unconditionally.
  */
object LocalSession {
  def build(defaultCpus: String = "4",
            extra: Map[String, String] = Map.empty): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", defaultCpus)
    val b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
